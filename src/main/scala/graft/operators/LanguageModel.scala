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

  /** All-token counts `(w, c)` — the backoff chain's unigram table
    * (raw occurrences, unlike [[unigramCounts]] which counts bigram
    * CONDITIONING events; stupid backoff wants raw frequencies at
    * every order). */
  def tokenCounts(ref: DataFrame, id: Column, text: Column): DataFrame =
    ref.select(explode(split(Cleanser.normalized(coalesce(text, lit(""))),
        " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Exploded trigram stream `(id, w1, w2, w3)` — docs with ≥ 3
    * tokens. */
  private[graft] def trigramStream(df: DataFrame, id: Column, text: Column)
      : DataFrame =
    df.select(id.as("id"), text.as("__t"))
      .where(size(wordsOf(col("__t"))) >= 3)
      .select(col("id"), explode(
        let(wordsOf(col("__t")), ws =>
          transform(sequence(lit(0), size(ws) - 3), i =>
            struct(element_at(ws, i + 1).as("w1"),
              element_at(ws, i + 2).as("w2"),
              element_at(ws, i + 3).as("w3"))))).as("__b"))
      .select(col("id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"),
        col("__b.w3").as("w3"))

  /** Trigram counts `(w1, w2, w3, c)` over the reference corpus. */
  def trigramCounts(ref: DataFrame, id: Column, text: Column): DataFrame =
    trigramStream(ref, id, text)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c"))

  /** The trigram-backoff integer core `(id, n_events, hit3, hit2,
    * hit1)`: per document, each trigram event resolved at its
    * HIGHEST known order — trigram hit, else (w2,w3) bigram hit,
    * else w3 unigram hit (the residue is OOV: n_events − hit3 −
    * hit2 − hit1). Mutually exclusive levels, pure longs — the
    * oracle-checked twin of [[stupidBackoff]], which walks the same
    * resolution ladder with scores attached. */
  def backoffCounts(docs: DataFrame, id: Column, text: Column,
                    trigrams: DataFrame, bigrams: DataFrame,
                    tokens: DataFrame): DataFrame =
    trigramStream(docs, id, text)
      .join(trigrams.withColumnRenamed("c", "__c3"),
        Seq("w1", "w2", "w3"), "left")
      .join(bigrams.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c").as("__c23")), Seq("w2", "w3"), "left")
      .join(tokens.select(col("w").as("w3"), col("c").as("__ct3")),
        Seq("w3"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("__c3").isNotNull.cast("long")).as("hit3"),
        sum((col("__c3").isNull && col("__c23").isNotNull).cast("long"))
          .as("hit2"),
        sum((col("__c3").isNull && col("__c23").isNull &&
          col("__ct3").isNotNull).cast("long")).as("hit1"))

  /** Stupid backoff scoring (Brants et al., "Large Language Models
    * in Machine Translation", EMNLP 2007 — the web-scale scheme that
    * skips backoff normalization entirely):
    * `S(w3|w1,w2) = c(w1w2w3)/c(w1w2)` when the trigram is known,
    * else `λ·c(w2w3)/c(w2)`, else `λ²·c(w3)/N`, else `λ²·α/N` (a
    * floor so OOV stays finite). Returns `(id, n_events, avg_logs)`
    * with `avg_logs` the mean log score — higher = more
    * reference-like. Five vocabulary-sized broadcast joins + the
    * one-row N broadcast over the same stream as [[backoffCounts]]
    * (its oracle-green integer twin). */
  def stupidBackoff(docs: DataFrame, id: Column, text: Column,
                    trigrams: DataFrame, bigrams: DataFrame,
                    tokens: DataFrame, lambda: Double = 0.4,
                    alpha: Double = 0.1): DataFrame = {
    require(lambda > 0 && alpha > 0)
    val n = tokens.agg(sum(col("c")).cast("double").as("__n"))
    trigramStream(docs, id, text)
      .join(trigrams.withColumnRenamed("c", "__c3"),
        Seq("w1", "w2", "w3"), "left")
      .join(bigrams.select(col("w1"), col("w2"), col("c").as("__c12")),
        Seq("w1", "w2"), "left")
      .join(bigrams.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c").as("__c23")), Seq("w2", "w3"), "left")
      .join(tokens.select(col("w").as("w2"), col("c").as("__ct2")),
        Seq("w2"), "left")
      .join(tokens.select(col("w").as("w3"), col("c").as("__ct3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(n))
      .withColumn("__s",
        when(col("__c3").isNotNull,
          col("__c3").cast("double") / col("__c12"))
          .when(col("__c23").isNotNull,
            lit(lambda) * col("__c23").cast("double") / col("__ct2"))
          .when(col("__ct3").isNotNull,
            lit(lambda * lambda) * col("__ct3").cast("double") / col("__n"))
          .otherwise(lit(lambda * lambda) * lit(alpha) / col("__n")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_events"),
        avg(log(col("__s"))).as("avg_logs"))
  }

  /** Left-context diversity `(w2, l)` — in how many DISTINCT left
    * contexts each word appears (`N1+(·, w2)`): Kneser–Ney's
    * continuation count, the insight that "Francisco" is frequent
    * but continues almost nothing. One distinct + count aggregate
    * over the bigram TYPE set (vocabulary-sized). */
  def leftDiversity(ref: DataFrame, id: Column, text: Column): DataFrame =
    bigramStream(ref, id, text).select("w1", "w2").distinct()
      .groupBy("w2").agg(count(lit(1)).as("l"))

  /** Right-context diversity `(w1, r)` — `N1+(w1, ·)`, the discount
    * mass normalizer of the Kneser–Ney interpolation. */
  def rightDiversity(ref: DataFrame, id: Column, text: Column): DataFrame =
    bigramStream(ref, id, text).select("w1", "w2").distinct()
      .groupBy("w1").agg(count(lit(1)).as("r"))

  /** The Kneser–Ney integer core `(id, n_events, sum_c12, sum_c1,
    * sum_l, sum_r)`: per document, the summed bigram counts,
    * conditioning counts, and left/right diversities of its events —
    * every quantity the interpolated score combines, in pure longs
    * (the oracle-checked twin of [[kneserNey]]). */
  def knCounts(docs: DataFrame, id: Column, text: Column,
               bigrams: DataFrame, unigrams: DataFrame,
               leftDiv: DataFrame, rightDiv: DataFrame): DataFrame =
    bigramStream(docs, id, text)
      .join(bigrams.withColumnRenamed("c", "__cb"), Seq("w1", "w2"), "left")
      .join(unigrams.withColumnRenamed("c", "__cu"), Seq("w1"), "left")
      .join(leftDiv.withColumnRenamed("l", "__l"), Seq("w2"), "left")
      .join(rightDiv.withColumnRenamed("r", "__r"), Seq("w1"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_events"),
        sum(coalesce(col("__cb"), lit(0L))).as("sum_c12"),
        sum(coalesce(col("__cu"), lit(0L))).as("sum_c1"),
        sum(coalesce(col("__l"), lit(0L))).as("sum_l"),
        sum(coalesce(col("__r"), lit(0L))).as("sum_r"))

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney, ICASSP
    * 1995; the Chen & Goodman 1999 interpolated form — the standard
    * n-gram smoothing):
    * `P(w2|w1) = max(c12 − D, 0)/c1 + D·R(w1)/c1 · L(w2)/T`
    * with `D` the absolute discount, `R` the right diversity (how
    * much mass w1 discounts), `L` the continuation count and `T`
    * the bigram type total — unseen-context events (`c1 = 0`) fall
    * back to the continuation distribution `(L(w2) + α)/(T + α·V₂)`
    * so everything stays finite. Returns `(id, n_events,
    * avg_logp)`, higher = more reference-like. Same join plan as
    * [[knCounts]] (its oracle-green integer twin) plus the one-row
    * (T, V₂) broadcast. */
  def kneserNey(docs: DataFrame, id: Column, text: Column,
                bigrams: DataFrame, unigrams: DataFrame,
                leftDiv: DataFrame, rightDiv: DataFrame,
                discount: Double = 0.75, alpha: Double = 0.1)
      : DataFrame = {
    require(discount > 0 && discount < 1, "discount in (0, 1)")
    require(alpha > 0, "alpha must be positive")
    val tot = broadcast(bigrams.agg(
      count(lit(1)).cast("double").as("__t"),
      countDistinct(col("w2")).cast("double").as("__v2")))
    bigramStream(docs, id, text)
      .join(bigrams.withColumnRenamed("c", "__cb"), Seq("w1", "w2"), "left")
      .join(unigrams.withColumnRenamed("c", "__cu"), Seq("w1"), "left")
      .join(leftDiv.withColumnRenamed("l", "__l"), Seq("w2"), "left")
      .join(rightDiv.withColumnRenamed("r", "__r"), Seq("w1"), "left")
      .crossJoin(tot)
      .withColumn("__pcont",
        (coalesce(col("__l"), lit(0L)) + alpha) /
          (col("__t") + lit(alpha) * col("__v2")))
      .withColumn("__p",
        when(col("__cu").isNotNull,
          greatest(coalesce(col("__cb"), lit(0L)).cast("double") - discount,
            lit(0.0)) / col("__cu") +
            lit(discount) * coalesce(col("__r"), lit(0L)) / col("__cu") *
            col("__pcont"))
          .otherwise(col("__pcont")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_events"),
        avg(log(col("__p"))).as("avg_logp"))
  }

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
