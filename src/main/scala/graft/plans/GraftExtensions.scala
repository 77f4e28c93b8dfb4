package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the typed
  * Column API.
  *
  * Two entry points:
  *  - `new GraftExtensions` as a `spark.sql.extensions` class for new
  *    sessions (`SparkSession.builder.withExtensions` /
  *    `--conf spark.sql.extensions=graft.plans.GraftExtensions`);
  *  - `GraftExtensions.register(spark)` to add the functions to an
  *    already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  private[plans] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double-precision dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("hashed_shingles"),
      info("hashed_shingles", "hashed_shingles(tokens, n) - xxhash64 of every n-token shingle"),
      (args: Seq[Expression]) => HashedShingles(args(0), intArg(args(1), "n"))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingle_hashes, k) - k-position MinHash signature"),
      (args: Seq[Expression]) => MinHashSig(args(0), intArg(args(1), "k"))),
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(token_hashes) - 64-bit majority-vote SimHash"),
      (args: Seq[Expression]) => SimHash64(args(0))))

  private def intArg(e: Expression, name: String): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
      lit.value.toString.toInt
    case other =>
      throw new IllegalArgumentException(
        s"$name must be an integer literal, got $other")
  }

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
}
