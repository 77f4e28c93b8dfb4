package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.Bpe

/** BPE vocabulary induction: distributed pair counting + driver
  * merge loop vs an independent reference implementation. */
class BpeSpec extends GraftSuite {

  /** Straight-line reference BPE over collected word counts — the
    * Sennrich algorithm verbatim, no Spark. */
  private def refBpe(words: Map[String, Long], numMerges: Int)
      : (Vector[(String, String)], Map[String, Vector[String]]) = {
    def mergeOnce(syms: Vector[String], a: String, b: String)
        : Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    var seg = words.map { case (w, _) =>
      w -> (w.split("").toVector :+ Bpe.EndOfWord)
    }
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      seg.foreach { case (w, syms) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) += words(w)
          case _ =>
        }
      }
      val live = counts.filter(_._2 >= 2)
      if (live.isEmpty) done = true
      else {
        val ((a, b), _) = live.minBy { case ((a, b), n) => (-n, a, b) }
        merges :+= ((a, b))
        seg = seg.map { case (w, syms) => w -> mergeOnce(syms, a, b) }
      }
    }
    (merges, seg)
  }

  test("BPE train == reference merges and segmentation; encode round-trips; OOV falls back to chars") {
    val s = spark; import s.implicits._
    val docs = Tables(spark, sfDir).documents
    val model = Bpe.train(docs, col("text"), numMerges = 12)
    // reference replay over the same word counts
    val wc = Bpe.wordCounts(docs, col("text"))
      .as[(String, Long)].collect().toMap
    val (refMerges, refSeg) = refBpe(wc, 12)
    assert(model.merges == refMerges,
      s"merge lists diverged:\n  got ${model.merges}\n  ref $refMerges")
    val gotSeg = model.vocab.select("w", "syms")
      .as[(String, Seq[String])].collect()
      .map { case (w, ss) => w -> ss.toVector }.toMap
    assert(gotSeg == refSeg, "final segmentation diverged from reference")
    // merges actually compress: total symbol count strictly drops
    val before = wc.keysIterator.map(w => (w.length + 1).toLong).sum
    val after = gotSeg.map { case (w, ss) => ss.length.toLong }.sum
    assert(after < before, s"no compression: $before -> $after")
    // encode: every in-vocab word's tokens concatenate back to the
    // word + marker; OOV words fall back to their character split
    val probe = Seq((1L, "batch window zzqqxy")).toDF("doc_id", "text")
    val enc = Bpe.encode(probe, col("doc_id"), col("text"), model)
      .select("word_pos", "sym_pos", "oov", "token")
      .as[(Int, Int, Boolean, String)].collect()
      .sortBy(e => (e._1, e._2))
      .map(e => (e._1, e._4, e._3))
    val byWord = enc.groupBy(_._1).view
      .mapValues(_.map(_._2).mkString).toMap
    assert(byWord(0) == "batch" + Bpe.EndOfWord)
    assert(byWord(1) == "window" + Bpe.EndOfWord)
    assert(byWord(2) == "zzqqxy" + Bpe.EndOfWord)
    assert(enc.filter(_._1 == 2).forall(_._3), "unseen word not flagged oov")
    assert(enc.filter(_._1 == 2).count(e => e._2 != Bpe.EndOfWord) == 6,
      "oov fallback is not the character split")
    assert(enc.filter(_._1 < 2).forall(!_._3))
    // in-vocab encodes use the trained segmentation verbatim
    val batchToks = enc.filter(_._1 == 0).map(_._2).toVector
    assert(batchToks == refSeg("batch"))
    // determinism across retrains
    val again = Bpe.train(docs, col("text"), numMerges = 12)
    assert(again.merges == model.merges)
  }

  test("driver-local merge replay == distributed rounds (merges and segmentation)") {
    val s = spark; import s.implicits._
    val docs = Tables(spark, sfDir).documents
    // the default path collects the vocabulary once and replays the
    // merge loop locally — zero Spark jobs per round; forcing
    // localFinishMaxVocab = 0 runs the per-round distributed jobs.
    // Both must produce the identical model (the local argmax
    // compares symbols by UTF-8 bytes, Spark's binary ordering).
    val local = Bpe.train(docs, col("text"), numMerges = 10)
    val dist = Bpe.train(docs, col("text"), numMerges = 10,
      localFinishMaxVocab = 0L)
    assert(local.merges == dist.merges,
      s"local vs distributed merges:\n  ${local.merges}\n  ${dist.merges}")
    def seg(m: Bpe.Model) = m.vocab.select("w", "syms")
      .as[(String, Seq[String])].collect()
      .map { case (w, ss) => w -> ss.toVector }.toMap
    assert(seg(local) == seg(dist), "segmentations diverged")
    // non-ASCII tie-break parity: symbols above U+007F (and a
    // surrogate-pair emoji above U+FFFF, where UTF-16 compareTo and
    // UTF-8 byte order genuinely disagree) forced into argmax ties
    // � vs 😀 is the discriminating tie: UTF-16 compareTo says
    // � (0xFFFD) > the surrogate lead (0xD83D) while UTF-8
    // bytes say � (0xEF…) < U+1F600 (0xF0…) — a Java-compareTo
    // local argmax would pick the other winner
    val tricky = Seq((1L, "ZZé ZZé ZZ😀 ZZ😀 ZZ� ZZ� ZZa ZZa"))
      .toDF("doc_id", "text")
    val lt = Bpe.train(tricky, col("text"), numMerges = 4)
    val dt = Bpe.train(tricky, col("text"), numMerges = 4,
      localFinishMaxVocab = 0L)
    assert(lt.merges == dt.merges,
      s"tie-break diverged on non-ASCII: ${lt.merges} vs ${dt.merges}")
    assert(seg(lt) == seg(dt))
  }

  test("pairCounts round 0 is exactly the weighted character-bigram table") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "ab ab ba"), (2L, "ab")).toDF("doc_id", "text")
    val vocab = Bpe.wordCounts(docs, col("text"))
    // ab: 3, ba: 1 → pairs (a,b):3, (b,</w>):3+1, (b,a):1, (a,</w>):1
    val seg = vocab.select(col("w"), col("c"),
      concat(split(col("w"), ""), array(lit(Bpe.EndOfWord))).as("syms"))
    val got = Bpe.pairCounts(seg)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 3L), ("b", Bpe.EndOfWord, 3L),
      ("b", "a", 1L), ("a", Bpe.EndOfWord, 1L)))
  }
}
