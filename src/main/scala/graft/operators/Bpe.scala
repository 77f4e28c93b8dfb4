package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Cleanser

/** Byte-pair-encoding vocabulary induction (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 —
  * a published method): start from characters (plus the `</w>`
  * end-of-word marker), repeatedly count adjacent symbol pairs and
  * merge the most frequent one, and the merge list IS the learned
  * subword vocabulary.
  *
  * The scale insight that makes BPE training cheap on a 100 TB
  * corpus: after ONE corpus pass (the word-count groupBy), every
  * training round operates on the WORD VOCABULARY weighted by count
  * — orders of magnitude below the corpus, regardless of corpus
  * size. Each round is one vocabulary-sized pair-count aggregate
  * (map-side combined) + a driver argmax with a deterministic
  * lexicographic tie-break, so the merge list is a pure function of
  * the word counts.
  *
  * ENCODING joins back through the trained vocabulary's final
  * segmentation (`word → symbols` is known exactly for every trained
  * word — no per-row merge replay), which keeps the encode a pair of
  * vocabulary-keyed equi-joins; out-of-vocabulary words fall back to
  * their character split (the standard serving fallback; documented,
  * not hidden).
  */
object Bpe {

  /** End-of-word marker (the Sennrich formulation — without it,
    * word-final and word-internal units alias). */
  val EndOfWord = "</w>"

  private def let(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Character symbols of a word + the `</w>` marker. */
  private def symbolsOf(w: Column): Column =
    concat(split(w, ""), array(lit(EndOfWord)))

  /** Corpus word counts `(w, c)` — the ONE corpus-sized pass;
    * everything after is vocabulary-sized. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(Cleanser.normalized(coalesce(text, lit(""))),
        " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Adjacent-pair counts `(a, b, n)` over a segmented vocabulary
    * `(w, c, syms)` — each pair weighted by its word's corpus count.
    * One merge round's E-step; also the oracle-checked query surface
    * (round 0 = counts over the raw character split). */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("c"), col("syms"))
      .where(size(col("syms")) >= 2)
      .select(col("c"), explode(let(col("syms"), s =>
        transform(sequence(lit(0), size(s) - 2), i =>
          struct(element_at(s, i + 1).as("a"),
            element_at(s, i + 2).as("b"))))).as("p"))
      .groupBy("p.a", "p.b")
      .agg(sum(col("c")).as("n"))
      .select(col("a"), col("b"), col("n"))

  /** One left-to-right greedy merge pass of pair (a, b) over a
    * symbol array — the BPE application rule (leftmost occurrence
    * first: `a a a` under merge (a,a) becomes `aa a`). */
  private def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learned model: the ranked merge list and the trained
    * vocabulary's final segmentation (exact for every trained
    * word). */
  final case class Model(merges: Seq[(String, String)], vocab: DataFrame)

  /** Train `numMerges` BPE merges over the corpus' word counts.
    * Deterministic: the argmax tie-breaks lexicographically on
    * (count desc, a, b), so the same corpus always yields the same
    * merge list from any partitioning. Each round localCheckpoints
    * the re-segmented vocabulary (vocabulary-sized — KBs to MBs) to
    * keep lineage flat across rounds. Stops early when no pair
    * repeats (fully merged). */
  def train(df: DataFrame, text: Column, numMerges: Int): Model = {
    require(numMerges >= 1, "at least one merge")
    var vocab = wordCounts(df, text)
      .select(col("w"), col("c"), symbolsOf(col("w")).as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      top.headOption match {
        case Some(r) if r.getLong(2) >= 2 =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val prev = vocab
          vocab = vocab
            .withColumn("syms", mergeOnce(col("syms"), a, b))
            .localCheckpoint(true)
          org.apache.spark.sql.graft.CheckpointBridge.unpersist(prev)
        case _ => exhausted = true
      }
    }
    Model(merges.toSeq, vocab)
  }

  /** Encode documents through the trained segmentation: `(id, word_pos,
    * sym_pos, token)` — every word of every document joined to its
    * final training-time symbols; unseen words fall back to their
    * character split (`oov = true`). Two vocabulary-keyed equi-joins
    * (broadcast when the vocab is small), never a per-row merge
    * replay. */
  def encode(df: DataFrame, id: Column, text: Column, model: Model)
      : DataFrame = {
    val seg = model.vocab.select(col("w"), col("syms"))
    df.select(id.as("id"),
        posexplode(filter(split(Cleanser.normalized(coalesce(text, lit(""))),
          " "), w => length(w) > 0)).as(Seq("word_pos", "w")))
      .join(seg, Seq("w"), "left")
      .select(col("id"), col("word_pos"),
        col("syms").isNull.as("oov"),
        posexplode(coalesce(col("syms"), symbolsOf(col("w"))))
          .as(Seq("sym_pos", "token")))
  }
}
