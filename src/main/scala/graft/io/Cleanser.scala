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

  /** Charset auto-detection for raw file bytes (r7): BOM-sniff, then
    * UTF-8-validate, then single-byte fallback — the reference's
    * utf-8→cp1252 decode ladder (ukg_open_census_file_cleanser.py's
    * try/except decode) widened to the encodings a real mixed file
    * drop contains:
    *  - a UTF-8 / UTF-16LE / UTF-16BE BOM wins outright (the BOM is
    *    STRIPPED — it is transport framing, not content);
    *  - no BOM: bytes that validate as UTF-8 are UTF-8 (the
    *    cheapest-first guess, and a cp1252 file of pure ASCII lands
    *    here identically);
    *  - otherwise the single-byte `fallback` charset (ISO-8859-1 by
    *    default — decodes every byte sequence, the cp1252
    *    superset-for-printables that stock Spark 4 allows without the
    *    legacy-charsets flag).
    *
    * Pure column expressions over the binary content — `when` arms
    * evaluate lazily per row, so the UTF-8 `decode` only ever runs on
    * byte ranges its guard proved valid (Spark 4's strict decode
    * throws on malformed input; the guard is what makes the ladder
    * total). Per-FILE granularity: apply to `binaryFile` content
    * before record splitting, exactly where [[CsvIngest.readCleansed]]
    * decodes. */
  def decodeAuto(content: Column, fallback: String = "ISO-8859-1"): Column = {
    val bomUtf8 = lit(Array(0xEF, 0xBB, 0xBF).map(_.toByte))
    val bomLe = lit(Array(0xFF, 0xFE).map(_.toByte))
    val bomBe = lit(Array(0xFE, 0xFF).map(_.toByte))
    val max = Int.MaxValue
    when(substring(content, 1, 3) === bomUtf8,
        decode(substring(content, 4, max), "UTF-8"))
      .when(substring(content, 1, 2) === bomLe,
        decode(substring(content, 3, max), "UTF-16LE"))
      .when(substring(content, 1, 2) === bomBe,
        decode(substring(content, 3, max), "UTF-16BE"))
      .when(is_valid_utf8(content.cast("string")), content.cast("string"))
      .otherwise(decode(content, fallback))
  }
}
