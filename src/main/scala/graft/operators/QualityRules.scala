package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Cleanser

/** Rule-based document quality filtering — the Gopher heuristics
  * (Rae et al., "Scaling Language Models: Methods, Analysis &
  * Insights from Training Gopher", 2021, Appendix A — a published
  * method): a battery of cheap structural checks (word count, mean
  * word length, symbol-to-word ratio, bullet/ellipsis line shares,
  * alphabetic-word share, stopword presence) whose conjunction
  * removes the bulk of machine-generated and boilerplate junk before
  * any model-based scoring spends compute on it.
  *
  * The whole battery is IN-ROW scan algebra over two let-bound
  * arrays (the word split and the line split): zero Exchange, runs
  * unchanged on a stream, and — the q54 ppm discipline — every rule
  * is evaluated as an INTEGER cross-multiplication
  * (`mean_len ∈ [3,10]` ⇔ `3·n ≤ Σlen ≤ 10·n`), so the output
  * carries no floating-point ratio and the DuckDB oracle replays it
  * hash-exactly. The raw counters ship alongside the verdict flags:
  * downstream mixers re-threshold without re-tokenizing.
  *
  * At 100 TB this is the cheapest filter in the ladder and belongs
  * FIRST in it: a bare projection ahead of the hashed-linear model
  * (q63), the n-gram LM, and every dedup pass.
  */
object QualityRules {

  /** Gopher's stopword battery (the "contains ≥ 2 of" rule). */
  val stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule verdicts `(id, counters…, ok_*…, keep)`.
    * Thresholds are the paper's defaults, scaled to ratios by
    * integer cross-multiplication; `keep` is the conjunction. Null
    * or empty text yields zero counters and `keep = false` (the
    * word-count floor fails). Ellipsis symbols count both the
    * three-dot spelling and U+2026.
    *
    * Ratio conventions (integerized):
    *  - words: `minWords ≤ n_words ≤ maxWords`
    *  - mean word length in [3, 10]: `3·n ≤ Σlen ≤ 10·n`
    *  - symbol-to-word ratio (# and ellipsis) < 0.1:
    *    `10·n_symbols < n_words`
    *  - bullet lines ≤ 10%: `10·n_bullet ≤ n_lines`
    *  - ellipsis-terminated lines ≤ 30%: `10·n_ell_lines ≤ 3·n_lines`
    *  - alphabetic words ≥ 80%: `5·n_alpha ≥ 4·n_words`
    *  - stopword hits ≥ `minStopHits` distinct of the battery
    *    (Gopher's 2; corpora with artificial vocabularies tune it
    *    down rather than silently passing everything) */
  def gopherRules(df: DataFrame, id: Column, text: Column,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minStopHits: Int = 2): DataFrame = {
    def let(bound: Column, body: Column => Column): Column =
      element_at(transform(array(bound), body), 1)
    val raw = coalesce(text, lit(""))
    // counters over the word array (normalized split) and the RAW
    // line split (normalize flattens line breaks, so line rules must
    // look before it)
    val counters = let(
      filter(split(Cleanser.normalized(raw), " "), w => length(w) > 0),
      ws => let(filter(split(raw, "\n"), l => length(trim(l)) > 0),
        ls => struct(
          size(ws).cast("long").as("n_words"),
          aggregate(ws, lit(0L), (a, w) => a + length(w)).as("sum_word_len"),
          // \p{L}, not [a-z]: an ASCII-only letter class would count
          // every accented or non-Latin word as non-alphabetic and
          // mass-fail the 80% rule on any non-English corpus (the
          // DuckDB replays use the same Unicode class — RE2 and Java
          // agree on the L category)
          size(filter(ws, w => w.rlike("\\p{L}"))).cast("long")
            .as("n_alpha_words"),
          (length(raw) - length(regexp_replace(raw, "#", "")))
            .cast("long").as("n_hash"),
          ((length(raw) - length(regexp_replace(raw, "\\.\\.\\.", ""))) / 3 +
            (length(raw) - length(regexp_replace(raw, "…", ""))))
            .cast("long").as("n_ellipsis"),
          size(ls).cast("long").as("n_lines"),
          size(filter(ls, l =>
            trim(l).rlike("^[-*•]"))).cast("long").as("n_bullet"),
          size(filter(ls, l =>
            trim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
            .as("n_ell_lines"),
          stopwords.map(sw =>
            array_contains(ws, sw).cast("long")).reduce(_ + _)
            .as("stop_hits"))))
    df.select(id.as("id"), counters.as("__c"))
      .select(col("id"), col("__c.*"))
      .withColumn("n_symbols", col("n_hash") + col("n_ellipsis"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_word_len",
        lit(3) * col("n_words") <= col("sum_word_len") &&
          col("sum_word_len") <= lit(10) * col("n_words"))
      .withColumn("ok_symbol", lit(10) * col("n_symbols") < col("n_words"))
      .withColumn("ok_bullet", lit(10) * col("n_bullet") <= col("n_lines"))
      .withColumn("ok_ellipsis",
        lit(10) * col("n_ell_lines") <= lit(3) * col("n_lines"))
      .withColumn("ok_alpha",
        lit(5) * col("n_alpha_words") >= lit(4) * col("n_words"))
      .withColumn("ok_stop", col("stop_hits") >= minStopHits)
      .withColumn("keep",
        col("ok_words") && col("ok_word_len") && col("ok_symbol") &&
          col("ok_bullet") && col("ok_ellipsis") && col("ok_alpha") &&
          col("ok_stop"))
      .drop("n_hash")
  }
}
