package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.{Bpe, Unigram}

class UnigramSpec extends GraftSuite {

  /** Straight-line reference unigram-LM trainer over collected word
    * counts — the Kudo loop with the E-step done by EXHAUSTIVE
    * segmentation enumeration (every way to split the word into
    * vocabulary pieces, probability = product, expected counts =
    * probability-weighted piece counts) instead of forward–backward.
    * Mirrors [[Unigram.train]]'s seed, M-step, and prune rules
    * verbatim, so any divergence isolates the lattice math. */
  private def refTrain(words: Seq[(String, Long)], vocabSize: Int,
                       maxLen: Int, seedSize: Int, emIters: Int,
                       pruneKeep: Double)
      : Vector[(String, Double)] = {
    val subCounts = scala.collection.mutable.Map
      .empty[String, Long].withDefaultValue(0L)
    words.foreach { case (w, c) =>
      for (i <- 0 until w.length;
           l <- 1 to math.min(maxLen, w.length - i))
        subCounts(w.substring(i, i + l)) += c
    }
    val chars = subCounts.keys.filter(_.length == 1).toVector.sorted
    val multi = subCounts.iterator.filter(_._1.length > 1).toVector
      .sortBy { case (p, n) => (-n, p) }
      .take(math.max(0, seedSize - chars.size)).map(_._1)
    var pieces: Vector[String] = chars ++ multi
    val seedTotal = pieces.iterator.map(subCounts).sum.toDouble
    var logp: Map[String, Double] = pieces.iterator
      .map(p => p -> math.log(subCounts(p) / seedTotal)).toMap

    def segmentations(w: String, lp: Map[String, Double])
        : Seq[Vector[String]] =
      if (w.isEmpty) Seq(Vector.empty)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val h = w.substring(0, l)
        if (lp.contains(h)) segmentations(w.substring(l), lp)
          .map(h +: _)
        else Seq.empty
      }
    def expected(lp: Map[String, Double])
        : scala.collection.mutable.Map[String, Double] = {
      val e = scala.collection.mutable.Map.empty[String, Double]
        .withDefaultValue(0.0)
      words.foreach { case (w, c) =>
        val segs = segmentations(w, lp)
        val probs = segs.map(_.iterator.map(lp).sum).map(math.exp)
        val z = probs.sum
        segs.zip(probs).foreach { case (seg, pr) =>
          seg.foreach(p => e(p) += c * pr / z)
        }
      }
      e
    }
    def emRounds(): scala.collection.mutable.Map[String, Double] = {
      var e = expected(logp)
      var r = 1
      while (r <= emIters) {
        val total = pieces.iterator.map(e(_)).sum
        logp = pieces.iterator
          .map(p => p -> math.log(e(p) / total)).toMap
        if (r < emIters) e = expected(logp)
        r += 1
      }
      e
    }
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
    pieces.map(p => (p, logp(p)))
  }

  test("unigram train == exhaustive-enumeration reference (seed, EM, prune); deterministic") {
    val s = spark; import s.implicits._
    // a small corpus with real segmentation ambiguity
    val docs = Seq(
      (1L, "abab abba ba ba ab"),
      (2L, "baba abab bb aa abab"),
      (3L, "aabb abab baab ba")).toDF("doc_id", "text")
    val model = Unigram.train(docs, col("text"), vocabSize = 8,
      maxLen = 3, seedSize = 12, emIters = 3, pruneKeep = 0.6)
    val got = model.pieces.as[(String, Double)].collect()
      .sortBy(_._1).toVector
    val wc = Bpe.wordCounts(docs, col("text"))
      .as[(String, Long)].collect().toSeq
    val ref = refTrain(wc, vocabSize = 8, maxLen = 3, seedSize = 12,
      emIters = 3, pruneKeep = 0.6).sortBy(_._1)
    assert(got.map(_._1) == ref.map(_._1),
      s"piece sets diverged:\n got ${got.map(_._1)}\n ref ${ref.map(_._1)}")
    got.zip(ref).foreach { case ((p, lg), (_, lr)) =>
      assert(math.abs(lg - lr) < 1e-9,
        s"logp($p): lattice $lg vs enumeration $lr")
    }
    // deterministic across retrains (bitwise)
    val again = Unigram.train(docs, col("text"), vocabSize = 8,
      maxLen = 3, seedSize = 12, emIters = 3, pruneKeep = 0.6)
    assert(again.pieces.as[(String, Double)].collect().sortBy(_._1)
      .toVector == got)
  }

  test("trained vocab on the corpus: chars never pruned, Viterbi is the argmax segmentation, encode round-trips") {
    val s = spark; import s.implicits._
    val docs = Tables(spark, sfDir).documents
    val model = Unigram.train(docs, col("text"), vocabSize = 120,
      maxLen = 4, seedSize = 400, emIters = 2)
    val pieceMap = model.pieces.as[(String, Double)].collect().toMap
    val vocab = model.vocab.as[(String, Long, Seq[String])].collect()
    assert(vocab.nonEmpty && pieceMap.nonEmpty)
    // every character of every trained word is a piece (coverage)
    val allChars = vocab.flatMap(_._1.split("")).toSet
    assert(allChars.forall(pieceMap.contains),
      "a character piece was pruned")
    // the stored segmentation concatenates back and is the argmax
    // over ALL segmentations (enumeration check on short words)
    def segmentations(w: String): Seq[Vector[String]] =
      if (w.isEmpty) Seq(Vector.empty)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val h = w.substring(0, l)
        if (pieceMap.contains(h)) segmentations(w.substring(l))
          .map(h +: _)
        else Seq.empty
      }
    vocab.foreach { case (w, _, seg) =>
      assert(seg.mkString == w, s"segmentation of '$w' broken: $seg")
      assert(seg.forall(pieceMap.contains))
    }
    vocab.filter(_._1.length <= 8).take(200).foreach { case (w, _, seg) =>
      val best = segmentations(w).map(s0 =>
        s0.iterator.map(pieceMap).sum).max
      val gotLp = seg.iterator.map(pieceMap).sum
      assert(math.abs(gotLp - best) < 1e-9,
        s"'$w': stored seg logp $gotLp vs best $best")
    }
    // compression: multi-char pieces actually used
    assert(vocab.exists(_._3.exists(_.length > 1)),
      "no multi-char piece survives in any segmentation")
    // encode: in-vocab words use the stored segmentation; OOV falls
    // back to the character split, flagged
    val probe = Seq((1L, vocab.head._1 + " zzqqxy")).toDF("doc_id", "text")
    val enc = Unigram.encode(probe, col("doc_id"), col("text"), model)
      .select("word_pos", "piece_pos", "oov", "token")
      .as[(Int, Int, Boolean, String)].collect().sortBy(e => (e._1, e._2))
    val w0 = enc.filter(_._1 == 0)
    assert(w0.map(_._4).toVector == vocab.head._3.toVector)
    assert(w0.forall(!_._3))
    val w1 = enc.filter(_._1 == 1)
    assert(w1.forall(_._3) && w1.map(_._4).mkString == "zzqqxy" &&
      w1.forall(_._4.length == 1))
  }

  test("candidateCounts is the exact weighted substring-occurrence table") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "aba ab"), (2L, "ab aba")).toDF("doc_id", "text")
    val got = Unigram.candidateCounts(docs, col("text"), maxLen = 3)
      .as[(String, Long)].collect().toMap
    // words: aba x2, ab x2. aba subs: a(2 occ),b,ab,ba,aba; ab: a,b,ab
    val want = Map(
      "a" -> (2L * 2 + 2L), "b" -> (2L + 2L), "ab" -> (2L + 2L),
      "ba" -> 2L, "aba" -> 2L)
    assert(got == want, s"got $got")
  }
}
