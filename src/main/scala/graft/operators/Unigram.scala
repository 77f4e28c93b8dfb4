package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.Cleanser

/** Unigram-LM subword vocabulary induction (Kudo, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates", ACL 2018 — SentencePiece's default
  * trainer; a published method). The BPE sibling with the opposite
  * induction direction: BPE GROWS a vocabulary by merging, the
  * unigram trainer SHRINKS one — seed with frequent substrings,
  * EM-fit a unigram distribution over each word's segmentation
  * lattice, prune the pieces the fitted likelihood needs least, and
  * repeat until the target size.
  *
  * Scale contract (shared with [[Bpe]]): ONE corpus-sized pass — the
  * word-count groupBy — and every training round after it operates
  * on the WORD VOCABULARY weighted by count, orders of magnitude
  * below the corpus. The EM lattice math runs driver-local over the
  * frequency-truncated vocabulary (the [[train]] contract documents
  * the budget); ENCODING joins the corpus back through the trained
  * `word → pieces` Viterbi segmentation — a vocabulary-keyed
  * equi-join, never a per-row lattice replay.
  */
object Unigram {

  private def let(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  /** Candidate piece counts: every substring of length 1..`maxLen`
    * of every word OCCURRENCE, weighted by corpus word count — the
    * seed-vocabulary statistic (Kudo §3.2 seeds from frequent
    * substrings). Pure counting over the word vocabulary (the
    * substring explode is vocabulary × word-length × maxLen, never
    * corpus-sized) and ANSI-SQL-replayable — the oracle-checked
    * query surface of the trainer, the [[Bpe.pairCounts]] pattern. */
  def candidateCounts(df: DataFrame, text: Column, maxLen: Int)
      : DataFrame = {
    require(maxLen >= 1, "maxLen must be at least 1")
    Bpe.wordCounts(df, text)
      .select(col("c"), explode(let(col("w"), w =>
        flatten(transform(sequence(lit(1), length(w)), i =>
          transform(sequence(lit(1),
              least(lit(maxLen), length(w) - i + 1)),
            l => substr(w, i, l)))))).as("piece"))
      .groupBy("piece").agg(sum(col("c")).as("n"))
  }

  /** Learned model: the piece table `(piece, logp)` (natural-log
    * unigram probabilities) and the trained vocabulary's Viterbi
    * segmentation `(w, c, pieces)` — exact for every trained word. */
  final case class Model(pieces: DataFrame, vocab: DataFrame)

  /** Train a unigram-LM piece vocabulary of (at most) `vocabSize`
    * pieces.
    *
    * Algorithm (Kudo 2018 §3.2, the SentencePiece trainer loop):
    *  1. seed = every single character plus the `seedSize` most
    *     frequent substrings up to `maxLen` chars (count desc, piece
    *     asc tie-break), probabilities ∝ occurrence counts;
    *  2. EM (`emIters` rounds): E-step computes each piece's
    *     expected count over every word's segmentation lattice by
    *     forward–backward in log space (exact — no sampling; spec-
    *     pinned against exhaustive segmentation enumeration), M-step
    *     renormalizes;
    *  3. prune to `pruneKeep` of the current size — single
    *     characters are NEVER pruned (coverage guarantee: every
    *     word stays segmentable), multi-char pieces rank by expected
    *     count (desc, piece asc) — then re-run EM; repeat until
    *     ≤ `vocabSize`.
    *
    * Deterministic: seed order, EM arithmetic (fixed iteration
    * order), and every tie-break are pure functions of the word
    * counts.
    *
    * Driver-memory contract (the [[Bpe.train]] discipline): the
    * trainer collects the `localFinishMaxVocab` HIGHEST-COUNT words
    * (count desc, word asc — the standard frequency-truncated
    * training set; SentencePiece truncates its input the same way)
    * and runs the lattice math in-process — budget ~0.5–1 KB of
    * driver heap per word row. Raise the cap only after sizing the
    * driver; the corpus pass itself stays distributed and the
    * truncation is by FREQUENCY, so dropped tail words perturb
    * expected counts by at most their count mass. */
  def train(df: DataFrame, text: Column, vocabSize: Int,
            maxLen: Int = 4, seedSize: Int = 1000, emIters: Int = 2,
            pruneKeep: Double = 0.75,
            localFinishMaxVocab: Long = 300000L): Model = {
    require(vocabSize >= 1 && seedSize >= 1 && emIters >= 1)
    require(pruneKeep > 0.0 && pruneKeep < 1.0,
      "pruneKeep must be in (0, 1)")
    val spark = df.sparkSession
    import spark.implicits._
    val lim = math.min(localFinishMaxVocab, Int.MaxValue - 1L).toInt
    val words: Array[(String, Long)] = Bpe.wordCounts(df, text)
      .orderBy(col("c").desc, col("w")).limit(lim)
      .as[(String, Long)].collect()

    // ---- seed: chars + top multi-char substrings by count ----
    val subCounts = scala.collection.mutable.HashMap
      .empty[String, Long].withDefaultValue(0L)
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxLen && i + l <= w.length) {
          subCounts(w.substring(i, i + l)) += c
          l += 1
        }
        i += 1
      }
    }
    val chars = subCounts.keysIterator.filter(_.length == 1).toVector.sorted
    val multi = subCounts.iterator.filter(_._1.length > 1).toVector
      .sortBy { case (p, n) => (-n, p) }
      .take(math.max(0, seedSize - chars.size)).map(_._1)
    var pieces: Vector[String] = chars ++ multi
    val seedTotal = pieces.iterator.map(subCounts).sum.toDouble
    var logp: Map[String, Double] = pieces.iterator
      .map(p => p -> math.log(subCounts(p) / seedTotal)).toMap

    // ---- exact E-step: forward-backward over the word lattice ----
    // log-space throughout: a 30-char word of 1e-6-prob pieces is
    // far below double's linear range
    def logSumExp(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) +
        math.exp(b - m)) }
    def expectedCounts(lp: Map[String, Double])
        : (scala.collection.mutable.Map[String, Double], Double) = {
      val e = scala.collection.mutable.HashMap.empty[String, Double]
        .withDefaultValue(0.0)
      var ll = 0.0
      words.foreach { case (w, c) =>
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0; beta(n) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxLen)
          while (j < i) {
            lp.get(w.substring(j, i)).foreach { p =>
              alpha(i) = logSumExp(alpha(i), alpha(j) + p) }
            j += 1
          }
          i += 1
        }
        i = n - 1
        while (i >= 0) {
          var k = i + 1
          while (k <= math.min(n, i + maxLen)) {
            lp.get(w.substring(i, k)).foreach { p =>
              beta(i) = logSumExp(beta(i), p + beta(k)) }
            k += 1
          }
          i -= 1
        }
        val z = alpha(n) // log P(w); chars always present → finite
        ll += c * z
        var j = 0
        while (j < n) {
          var k = j + 1
          while (k <= math.min(n, j + maxLen)) {
            lp.get(w.substring(j, k)).foreach { p =>
              e(w.substring(j, k)) +=
                c * math.exp(alpha(j) + p + beta(k) - z) }
            k += 1
          }
          j += 1
        }
      }
      (e, ll)
    }
    def emRounds(): scala.collection.mutable.Map[String, Double] = {
      var e = expectedCounts(logp)._1
      var r = 1
      while (r <= emIters) {
        val total = pieces.iterator.map(e(_)).sum
        logp = pieces.iterator
          .map(p => p -> math.log(e(p) / total)).toMap
        if (r < emIters) e = expectedCounts(logp)._1
        r += 1
      }
      e
    }

    // ---- EM + prune loop ----
    // chars are never pruned, so the char set floors the final size:
    // a vocabSize below it yields exactly the chars (coverage wins)
    var e = emRounds()
    while (pieces.size > vocabSize && pieces.size > chars.size) {
      val keepMulti = math.max(0,
        math.min(pieces.size - chars.size - 1,
          math.ceil(pieces.size * pruneKeep).toInt - chars.size))
      val target = math.max(vocabSize - chars.size, keepMulti)
      val kept = pieces.iterator.filter(_.length > 1).toVector
        .sortBy(p => (-e(p), p)).take(math.max(0, target))
      pieces = chars ++ kept
      val total = pieces.iterator.map(e(_)).sum
      logp = pieces.iterator.map(p => p -> math.log(e(p) / total)).toMap
      e = emRounds()
    }

    // ---- Viterbi segmentation of every trained word ----
    def viterbi(w: String): Seq[String] = {
      val n = w.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val back = Array.fill(n + 1)(-1)
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          logp.get(w.substring(j, i)).foreach { p =>
            // strict > keeps the SMALLEST j on ties (longest final
            // piece) — a fixed, documented tie-break
            if (best(j) + p > best(i)) {
              best(i) = best(j) + p; back(i) = j
            }
          }
          j += 1
        }
        i += 1
      }
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var k = n
      while (k > 0) { out.prepend(w.substring(back(k), k)); k = back(k) }
      out.toList
    }
    val piecesDf = pieces.map(p => (p, logp(p))).toDF("piece", "logp")
      .localCheckpoint(true)
    val vocabDf = words.toSeq.map { case (w, c) => (w, c, viterbi(w)) }
      .toDF("w", "c", "pieces").localCheckpoint(true)
    Model(piecesDf, vocabDf)
  }

  /** Corpus encoded through the trained Viterbi segmentation — the
    * [[Bpe.encode]] shape: words join the vocabulary table (a
    * vocabulary-keyed equi-join; broadcast-able at any corpus size),
    * out-of-vocabulary words fall back to their character split
    * (complete — every character is a piece), flagged `oov`. */
  def encode(df: DataFrame, id: Column, text: Column, model: Model)
      : DataFrame = {
    val seg = model.vocab.select(col("w"), col("pieces"))
    df.select(id.as("id"),
        posexplode(filter(split(Cleanser.normalized(coalesce(text, lit(""))),
          " "), w => length(w) > 0)).as(Seq("word_pos", "w")))
      .join(seg, Seq("w"), "left")
      .select(col("id"), col("word_pos"),
        col("pieces").isNull.as("oov"),
        posexplode(coalesce(col("pieces"), split(col("w"), "")))
          .as(Seq("piece_pos", "token")))
  }
}
