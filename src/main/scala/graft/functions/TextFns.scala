package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.io.Cleanser

/** Text-analysis column functions for the training-data pipeline:
  * quality stats, token counting, language ID, fingerprints.
  *
  * All are pure `Column` expressions (whole-stage codegen, no UDFs),
  * so they run at full parquet scan speed on a 100 TB corpus — each
  * is a map-side projection with no shuffle of its own.
  */
object TextFns {

  /** Whitespace tokens. The corpus is single-space separated; for
    * messier text swap the literal for a `\s+` regex split. */
  def tokens(c: Column): Column = split(c, " ")

  /** BPE-ish token count: alpha runs, digit runs, and lone symbols —
    * the usual pre-tokenizer shape (letters/digits/punct split). */
  def bpeishCount(c: Column): Column =
    regexp_count(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Count of characters outside [a-zA-Z0-9 ]. */
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[^a-zA-Z0-9 ]"))

  def stopwordsEn: Seq[String] = Seq("the", "of", "and", "a", "to", "is")
  def stopwordsEs: Seq[String] = Seq("el", "la", "de", "los", "y", "es")
  def stopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ein")
  def stopwordsFr: Seq[String] = Seq("le", "la", "les", "de", "et")

  /** Number of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Stopword-scoring language ID. Deterministic tie-break: en, then
    * es, then de, then fr; all-zero scores → 'und'. A real system
    * would use char n-gram profiles; the *shape* (pure column math,
    * argmax ladder) is what scales.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val en = stopwordHits(toks, stopwordsEn)
    val es = stopwordHits(toks, stopwordsEs)
    val de = stopwordHits(toks, stopwordsDe)
    val fr = stopwordHits(toks, stopwordsFr)
    // null text first: the score comparisons below are all NULL for
    // it, which would fall through to the `otherwise` branch and
    // confidently mislabel a missing document as French
    when(text.isNull, "und")
      .when(greatest(en, es, de, fr) === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** PII redaction for training corpora: emails, international-ish
    * phone numbers, and SSN-shaped ids replaced with typed tags —
    * the standard scrub pass (C4/RefinedWeb-style) as a codegen'd
    * regexp chain. Patterns are deliberately conservative (precision
    * over recall); swap in stricter ones per deployment policy.
    *
    * Every pattern is RE2-expressible (no lookaround): the phone
    * rule anchors on a captured non-digit (or string edge) on each
    * side instead of `(?<![0-9])`/`(?![0-9])`, so the exact same
    * pattern+rewrite runs on engines without backtracking regex
    * (DuckDB/RE2 — this is what makes q_redact_pii oracle-checkable).
    * The one semantic difference vs the lookaround form: two phone
    * runs separated by a SINGLE non-digit leave the second
    * unredacted (its separator was consumed by the first match) —
    * identical in any leftmost-scan engine, so the behavior is
    * portable, and phones in prose are whitespace-delimited anyway.
    */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ssn = regexp_replace(email,
      "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<ID>")
    regexp_replace(ssn,
      "(^|[^0-9])(\\+?[0-9][0-9()\\-. ]{7,}[0-9])($|[^0-9])",
      "$1<PHONE>$3")
  }

  /** Word 2-gram array from a *materialized token-array column* (an
    * attribute, not an inline `split` — a lambda referencing an
    * inline expression re-evaluates it per element; stage tokens into
    * their own projection first, as the dedup operators do). */
  def bigramArray(toksAttr: Column): Column =
    when(size(toksAttr) >= 2,
      transform(sequence(lit(0), size(toksAttr) - 2),
        i => concat_ws(" ", element_at(toksAttr, i + 1),
          element_at(toksAttr, i + 2))))
      .otherwise(array())

  /** Gopher-style repetition signal: fraction of 2-gram positions
    * covered by the single most frequent 2-gram (high → boilerplate).
    * Single-pass per row: sort the gram array, fold counting the
    * longest equal run — no explode, no shuffle; expects a
    * materialized gram-array column (see `bigramArray`). */
  def topRunFraction(gramsAttr: Column): Column = {
    val folded = aggregate(array_sort(gramsAttr),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(g.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      })
    when(size(gramsAttr) > 0,
      folded.getField("best").cast("double") /
        size(gramsAttr).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Full-document fingerprint over cleansed text. */
  def fingerprint(c: Column): Column = md5(Cleanser.normalized(c).cast("binary"))

  /** Fingerprint of the first `n` normalized chars — cheap prefix
    * fingerprint for fast first-pass bucketing. */
  def headFingerprint(c: Column, n: Int): Column =
    md5(substring(Cleanser.normalized(c), 1, n).cast("binary"))

  /** Polynomial rolling hash over token lengths, mod 1e9+7 — the
    * order-sensitive fingerprint variant (two docs with the same token
    * multiset but different order hash differently). Folded with a
    * higher-order aggregate, so it stays codegen-adjacent and never
    * leaves the executor.
    */
  def rollingHash(c: Column): Column =
    aggregate(tokens(Cleanser.normalized(c)), lit(0L),
      (h, t) => (h * 31L + length(t)) % 1000000007L)

  /** Sliding-window character chunks for context-window prep: chunk i
    * covers chars [i·stride + 1, i·stride + size] (1-based,
    * stride = size − overlap), so consecutive chunks share `overlap`
    * chars. Chunk count = max(1, ⌈(len − overlap)/stride⌉): a chunk
    * exists only if it contributes at least one character past the
    * previous chunk's overlap — the naive ⌊(len−1)/stride⌋+1 count
    * emits a wholly-redundant tail chunk whenever
    * (len−1) mod stride < overlap. Empty/NULL text yields an
    * empty/NULL array.
    *
    * `text` is referenced once per chunk inside the `transform`
    * lambda — pass a materialized attribute, not a derived expression
    * (a normalization chain here would re-run per chunk; see the
    * staged-column convention on `bigramArray`).
    */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > overlap >= 0")
    val stride = size - overlap
    // last index = max(0, ⌊(len − overlap − 1)/stride⌋) — the floor
    // of a double division, clamped (it is negative for len ≤ overlap)
    val lastIdx = greatest(lit(0L),
      floor((length(text) - lit(overlap + 1)) / lit(stride.toDouble)))
    when(text.isNull, lit(null).cast("array<string>"))
      .when(length(text) === 0, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0L), lastIdx),
        i => text.substr((i * stride + 1).cast("int"), lit(size))))
  }
}
