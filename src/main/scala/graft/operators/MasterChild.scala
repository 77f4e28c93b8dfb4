package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Master/child normalization of denormalized (or nested) input.
  *
  * The reference walks nested JSON in Python and builds two pandas
  * frames (`get_master_child_df`, code/ukg_wrkload_dtl.py:142-177 and
  * ukg_stf_matrx.py:121-155): a master table of entity keys and a
  * child table of exploded attributes. Here the split is two
  * projections of one DataFrame — each side prunes to its own columns
  * at the scan, and "distinct master" uses the declared key only.
  */
object MasterChild {

  /** Master side: distinct (key, header) rows. Set semantics — NOT
    * `dropDuplicates(key)`, which picks an arbitrary row when the
    * same key carries conflicting header values and so is
    * nondeterministic across runs; with `distinct()` a conflicted key
    * surfaces as multiple rows (callers decide the resolution), and
    * when headers are functionally dependent on the key the two
    * behaviors coincide. */
  def master(denorm: DataFrame, key: Seq[String],
             headers: Seq[String]): DataFrame =
    denorm.select((key ++ headers).map(col): _*).distinct()

  /** Child side: key + per-line attributes (one row per child). */
  def child(denorm: DataFrame, key: Seq[String],
            attrs: Seq[String]): DataFrame =
    denorm.select((key ++ attrs).map(col): _*)
}
