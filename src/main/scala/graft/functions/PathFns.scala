package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Path/name parsing helpers.
  *
  * The reference does these with Python UDFs and driver-side string
  * code (`get_cost_center`, code/ukg_open_census.py:183-193;
  * `path_leaf`, :47-49; `substr(file_nm,9,12) as long`, :345). Here
  * they are pure `Column` expressions — whole-stage-codegen'd, no
  * serialization wall, usable at 100 TB scan speed.
  */
object PathFns {

  /** First `k` segments of a `sep`-separated path, re-joined — the
    * reference's cost-center extraction ("/".join(x.split("/")[:k])). */
  def prefixPath(c: Column, sep: String, k: Int): Column =
    array_join(slice(split(c, java.util.regex.Pattern.quote(sep)), 1, k), sep)

  /** Last path segment (reference `path_leaf`). */
  def pathLeaf(c: Column, sep: String = "/"): Column =
    element_at(split(c, java.util.regex.Pattern.quote(sep)), -1)

  /** First run of digits in a name, as a number — the reference's
    * embedded-file-timestamp parse. Null when no digits. */
  def numericId(c: Column): Column =
    nullif(regexp_extract(c, "([0-9]+)", 1), lit("")).cast("long")
}
