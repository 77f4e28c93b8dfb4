package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Field/file cleansing, distributed.
  *
  * The reference downloads whole files to the driver and regex-fixes
  * them in Python (code/ukg_open_census_file_cleanser.py): embedded
  * newlines not preceded by CR become spaces (:62), quotes and commas
  * inside fields are stripped (:86-88), the header row is dropped.
  * Here each repair is a codegen'd Column expression applied in the
  * scan — cleansing 100 TB never touches the driver.
  */
object Cleanser {

  /** `re.sub("(?<!\r)\n", " ", s)` — repair bare newlines inside
    * records while preserving CRLF record ends. */
  def repairBareNewlines(c: Column): Column =
    regexp_replace(c, "(?<!\r)\n", " ")

  /** Strip quotes and commas from a field (reference :87). */
  def stripQuotesCommas(c: Column): Column =
    regexp_replace(c, "[\",]", "")

  /** Full normalize used before fingerprinting: flatten ALL line
    * breaks (\r and \n — unlike `repairBareNewlines`, which preserves
    * CRLF because record splitting still needs it; a fingerprint
    * wants none), strip quotes/commas, trim, lower. Every step is
    * portable to lookbehind-free regex engines, so the DuckDB oracle
    * reproduces it exactly. */
  def normalized(c: Column): Column =
    lower(trim(stripQuotesCommas(regexp_replace(c, "[\r\n]", " "))))
}
