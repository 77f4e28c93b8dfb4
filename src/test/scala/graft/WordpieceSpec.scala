package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.{Bpe, Wordpiece}

/** WordPiece vocabulary induction (Schuster & Nakajima 2012):
  * distributed likelihood-scored merge loop vs an independent
  * straight-line reference, local-replay bit-identity, encode
  * round-trips, and the documented `#`-collision quirk — the
  * [[BpeSpec]]/[[UnigramSpec]] battery applied to the third trainer. */
class WordpieceSpec extends GraftSuite {

  /** Straight-line reference WordPiece over collected word counts —
    * no Spark. Round: count adjacent pairs and symbol occurrences
    * (both weighted by word count), keep pairs with n_ab >= 2, merge
    * the argmax of n_ab / (n_a * n_b) with ties broken (score desc,
    * a, b); the minted symbol is `a` + `b` minus its `##` marker.
    * ASCII-only corpora make Java string order == UTF-8 byte order,
    * so this reference is exact here; the non-ASCII tie-break is
    * pinned by the local==distributed test below. */
  private def refWordpiece(words: Map[String, Long], numMerges: Int)
      : (Vector[(String, String)], Map[String, Vector[String]]) = {
    def initial(w: String): Vector[String] =
      w.split("").toVector.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch else Wordpiece.Continuation + ch
      }
    def mergeOnce(syms: Vector[String], a: String, b: String,
                  m: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ m
        else acc :+ x
      }
    var seg = words.map { case (w, _) => w -> initial(w) }
    var merges = Vector.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      val pair = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      val sym = scala.collection.mutable.Map
        .empty[String, Long].withDefaultValue(0L)
      seg.foreach { case (w, syms) =>
        val c = words(w)
        syms.foreach(s => sym(s) += c)
        syms.sliding(2).foreach {
          case Seq(a, b) => pair((a, b)) += c
          case _ =>
        }
      }
      val live = pair.filter(_._2 >= 2)
      if (live.isEmpty) done = true
      else {
        // the score in the same IEEE operations as the operator:
        // long -> double casts, one multiply, one divide
        val ((a, b), _) = live
          .map { case (p, n) =>
            p -> (n.toDouble / (sym(p._1).toDouble * sym(p._2).toDouble))
          }
          .minBy { case ((a, b), s) => (-s, a, b) }
        merges :+= ((a, b))
        val m = Wordpiece.mergedSymbol(a, b)
        seg = seg.map { case (w, syms) => w -> mergeOnce(syms, a, b, m) }
      }
    }
    (merges, seg)
  }

  test("WordPiece train == reference merges and segmentation; retrain deterministic") {
    val s = spark; import s.implicits._
    val docs = Tables(spark, sfDir).documents
    val model = Wordpiece.train(docs, col("text"), numMerges = 12)
    val wc = Bpe.wordCounts(docs, col("text"))
      .as[(String, Long)].collect().toMap
    val (refMerges, refSeg) = refWordpiece(wc, 12)
    assert(model.merges == refMerges,
      s"merge lists diverged:\n  got ${model.merges}\n  ref $refMerges")
    val gotSeg = model.vocab.select("w", "syms")
      .as[(String, Seq[String])].collect()
      .map { case (w, ss) => w -> ss.toVector }.toMap
    assert(gotSeg == refSeg, "final segmentation diverged from reference")
    // likelihood-gain argmax is NOT the raw-frequency argmax: on this
    // corpus the two trainers must be allowed to differ, and the
    // WordPiece winner of round 1 is the pair with the best ratio,
    // not the biggest count (guards against scoreCol silently
    // degrading to BPE's count ordering)
    val stats = Wordpiece.pairStats(
      Bpe.wordCounts(docs, col("text")).select(col("w"), col("c"),
        Wordpiece.initialSymbols(col("w")).as("syms")))
      .as[(String, String, Long, Long, Long)].collect()
    val byScore = stats.filter(_._3 >= 2).minBy {
      case (a, b, nab, na, nb) =>
        (-(nab.toDouble / (na.toDouble * nb.toDouble)), a, b)
    }
    assert((byScore._1, byScore._2) == model.merges.head,
      "round-1 merge is not the likelihood-score argmax")
    // merges compress: total symbol count strictly drops
    val before = wc.keysIterator.map(_.length.toLong).sum
    val after = gotSeg.valuesIterator.map(_.length.toLong).sum
    assert(after < before, s"no compression: $before -> $after")
    // determinism across retrains
    val again = Wordpiece.train(docs, col("text"), numMerges = 12)
    assert(again.merges == model.merges)
  }

  test("driver-local merge replay == distributed rounds (merges and segmentation)") {
    val s = spark; import s.implicits._
    val docs = Tables(spark, sfDir).documents
    val local = Wordpiece.train(docs, col("text"), numMerges = 10)
    val dist = Wordpiece.train(docs, col("text"), numMerges = 10,
      localFinishMaxVocab = 0L)
    assert(local.merges == dist.merges,
      s"local vs distributed merges:\n  ${local.merges}\n  ${dist.merges}")
    def seg(m: Wordpiece.Model) = m.vocab.select("w", "syms")
      .as[(String, Seq[String])].collect()
      .map { case (w, ss) => w -> ss.toVector }.toMap
    assert(seg(local) == seg(dist), "segmentations diverged")
    // non-ASCII tie-break parity (the BpeSpec discriminating tie):
    // � (U+FFFD) vs 😀 (U+1F600) order differently under UTF-16
    // compareTo and UTF-8 bytes — a Java-compareTo local argmax
    // picks the other winner. Equal word counts force score ties.
    val tricky = Seq((1L, "ZZé ZZé ZZ😀 ZZ😀 ZZ� ZZ� ZZa ZZa"))
      .toDF("doc_id", "text")
    val lt = Wordpiece.train(tricky, col("text"), numMerges = 4)
    val dt = Wordpiece.train(tricky, col("text"), numMerges = 4,
      localFinishMaxVocab = 0L)
    assert(lt.merges == dt.merges,
      s"tie-break diverged on non-ASCII: ${lt.merges} vs ${dt.merges}")
    assert(seg(lt) == seg(dt))
  }

  test("encode concatenates back with markers stripped; OOV falls back to char split") {
    val s = spark; import s.implicits._
    val docs = Tables(spark, sfDir).documents
    val model = Wordpiece.train(docs, col("text"), numMerges = 12)
    val probe = Seq((1L, "batch window zzqqxy")).toDF("doc_id", "text")
    val enc = Wordpiece.encode(probe, col("doc_id"), col("text"), model)
      .select("word_pos", "sym_pos", "oov", "token")
      .as[(Int, Int, Boolean, String)].collect()
      .sortBy(e => (e._1, e._2))
    // ##-convention invariant: sym_pos 0 is bare, the rest carry the
    // marker; stripping it and concatenating rebuilds the word
    def rebuild(ts: Seq[(Int, String)]): String =
      ts.sortBy(_._1).map { case (i, t) =>
        if (i == 0) t else t.stripPrefix(Wordpiece.Continuation)
      }.mkString
    val byWord = enc.groupBy(_._1).view
      .mapValues(es => rebuild(es.map(e => (e._2, e._4)).toSeq)).toMap
    assert(byWord == Map(0 -> "batch", 1 -> "window", 2 -> "zzqqxy"))
    enc.filter(_._1 > 0).filter(_._2 > 0).foreach { e =>
      assert(e._4.startsWith(Wordpiece.Continuation),
        s"non-initial token without marker: $e")
    }
    // OOV word: flagged, and its fallback is exactly the character
    // split (6 chars -> 6 tokens); in-vocab words are unflagged and
    // use the trained segmentation verbatim
    assert(enc.filter(_._1 == 2).forall(_._3), "unseen word not flagged oov")
    assert(enc.count(_._1 == 2) == 6, "oov fallback is not the char split")
    assert(enc.filter(_._1 < 2).forall(!_._3))
    val trained = model.vocab.select("w", "syms")
      .where(col("w") === "batch")
      .as[(String, Seq[String])].collect().head._2
    assert(enc.filter(_._1 == 0).map(_._4).toSeq == trained)
  }

  test("the documented # collision: '#' text can mint the bare continuation marker") {
    val s = spark; import s.implicits._
    // the word "##" splits to ["#", "###"]; merging that pair strips
    // the marker from the right half and mints "##" — the bare
    // marker itself, aliasing word-internal units. Deliberately
    // inherited from the published convention (scaladoc pins it);
    // this test is the tripwire if the behavior ever changes.
    assert(Wordpiece.mergedSymbol("#", "###") == "##")
    val docs = Seq((1L, "## ## ## ##")).toDF("doc_id", "text")
    val m = Wordpiece.train(docs, col("text"), numMerges = 1)
    assert(m.merges == Seq(("#", "###")))
    val seg = m.vocab.select("w", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(seg("##") == Seq("##"), s"expected the minted bare marker: $seg")
    // and the local/distributed paths agree even here
    val d = Wordpiece.train(docs, col("text"), numMerges = 1,
      localFinishMaxVocab = 0L)
    assert(d.merges == m.merges)
  }

  test("pairStats round 0 is exactly the weighted pair + symbol count table") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "ab ab ba"), (2L, "ab")).toDF("doc_id", "text")
    val vocab = Bpe.wordCounts(docs, col("text"))
      .select(col("w"), col("c"),
        Wordpiece.initialSymbols(col("w")).as("syms"))
    // ab: 3 -> syms [a, ##b]; ba: 1 -> [b, ##a]
    // pairs: (a, ##b): 3, (b, ##a): 1
    // symbols: a: 3, ##b: 3, b: 1, ##a: 1
    val got = Wordpiece.pairStats(vocab)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "##b", 3L, 3L, 3L),
      ("b", "##a", 1L, 1L, 1L)))
  }
}
