package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Cleanser

/** N-gram language-model quality filtering — the CCNet recipe
  * (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", 2020, a published method): score
  * every document by its perplexity under a language model trained
  * on a known-good reference corpus, and keep the low-perplexity
  * (reference-like) head of the distribution. CCNet uses a 5-gram
  * KenLM; the distributed re-expression here is a bigram model with
  * add-α smoothing — the structure (train counts on reference →
  * join-score the corpus → rank by per-token log-likelihood) is the
  * operator; the order of the model is a parameter of taste.
  *
  * Scale contract:
  *  - TRAINING is two groupBy counts over the reference slice
  *    (map-side partial aggregation; output is vocabulary-sized,
  *    orders below the corpus).
  *  - SCORING is the decontaminate join shape: the corpus' exploded
  *    bigram stream equi-joins the count tables on (w1, w2) / (w1)
  *    — shuffle keyed by token pair, never corpus × corpus — then
  *    re-aggregates per document. Counts tables small enough to
  *    broadcast make the whole score a map-side pipeline.
  *  - The INTEGER core ([[scoreCounts]]: per-doc bigram hits and
  *    count mass) is engine-portable and oracle-checked; the log
  *    surface ([[perplexity]]) is the declared rows-only twin, same
  *    frame, one `ln`/`exp` projection apart.
  *
  * Docs with fewer than 2 tokens have no bigrams and are excluded
  * (a perplexity over zero events is undefined — document, don't
  * invent). Null text normalizes to the empty split and drops the
  * same way.
  */
object LanguageModel {

  private def let(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  private def wordsOf(text: Column): Column =
    split(Cleanser.normalized(coalesce(text, lit(""))), " ")

  /** Exploded bigram stream `(id, w1, w2)` — one row per adjacent
    * token pair of each document with ≥ 2 tokens. The let-binding
    * keeps CollapseProject from re-splitting the document per
    * bigram (the winnowing lesson). */
  private[graft] def bigramStream(df: DataFrame, id: Column, text: Column)
      : DataFrame =
    df.select(id.as("id"), text.as("__t"))
      .where(size(wordsOf(col("__t"))) >= 2)
      .select(col("id"), explode(
        let(wordsOf(col("__t")), ws =>
          transform(sequence(lit(0), size(ws) - 2), i =>
            struct(element_at(ws, i + 1).as("w1"),
              element_at(ws, i + 2).as("w2"))))).as("__b"))
      .select(col("id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"))

  /** Bigram counts `(w1, w2, c)` over the reference corpus. */
  def bigramCounts(ref: DataFrame, id: Column, text: Column): DataFrame =
    bigramStream(ref, id, text)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))

  /** Unigram counts `(w1, c)` over the reference corpus — the
    * conditional's denominator, counted over the SAME event stream
    * as the bigrams (each doc's last token conditions nothing, so it
    * is not a denominator event; Σ_w2 c(w1,w2) == c(w1) holds
    * exactly, which the spec asserts). */
  def unigramCounts(ref: DataFrame, id: Column, text: Column): DataFrame =
    bigramStream(ref, id, text)
      .groupBy("w1").agg(count(lit(1)).as("c"))

  /** The integer scoring core `(id, n_bigrams, hits, sum_cb,
    * sum_cu)`: per document, the bigram event count, how many events
    * exist in the reference table, and the summed bigram/unigram
    * count mass. Engine-portable (pure longs) — the oracle-checked
    * twin of [[perplexity]], which is one log projection over the
    * same joined frame. */
  def scoreCounts(docs: DataFrame, id: Column, text: Column,
                  bigrams: DataFrame, unigrams: DataFrame): DataFrame =
    bigramStream(docs, id, text)
      .join(bigrams.withColumnRenamed("c", "__cb"), Seq("w1", "w2"), "left")
      .join(unigrams.withColumnRenamed("c", "__cu"), Seq("w1"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__cb").isNotNull.cast("long")).as("hits"),
        sum(coalesce(col("__cb"), lit(0L))).as("sum_cb"),
        sum(coalesce(col("__cu"), lit(0L))).as("sum_cu"))

  /** Per-document perplexity `(id, n_bigrams, ppl)` under add-α
    * smoothing: P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V) with V
    * the reference bigram-type count (so unseen events get a proper
    * nonzero mass), ppl = exp(−mean log P). Lower = more
    * reference-like; CCNet keeps the head and drops (or
    * down-weights) the tail. V rides a one-row broadcast — the
    * scalar-subquery pattern every corpus-stat operator here uses;
    * the join plan is [[scoreCounts]]'s exactly. */
  def perplexity(docs: DataFrame, id: Column, text: Column,
                 bigrams: DataFrame, unigrams: DataFrame,
                 alpha: Double = 0.1): DataFrame = {
    require(alpha > 0, "alpha must be positive (unsmoothed OOV = log 0)")
    val v = bigrams.agg(count(lit(1)).as("__v"))
    bigramStream(docs, id, text)
      .join(bigrams.withColumnRenamed("c", "__cb"), Seq("w1", "w2"), "left")
      .join(unigrams.withColumnRenamed("c", "__cu"), Seq("w1"), "left")
      .crossJoin(broadcast(v))
      .withColumn("__logp",
        log((coalesce(col("__cb"), lit(0L)) + alpha) /
          (coalesce(col("__cu"), lit(0L)) + lit(alpha) * col("__v"))))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        exp(-avg(col("__logp"))).as("ppl"))
  }
}
