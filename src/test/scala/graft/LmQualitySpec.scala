package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.{LanguageModel, QualityRules}

/** Gopher rule battery + n-gram LM perplexity filtering — the two
  * pre-model quality gates of the CCNet/Gopher-style ladder. */
class LmQualitySpec extends GraftSuite {

  test("gopherRules: hand-checked counters and verdicts; zero Exchange") {
    val s = spark; import s.implicits._
    val good = ("the data " * 20).trim // 40 words, stopword 'the'
    val short = "the and of tiny"
    val bullets = "the data pipeline runs with and that\n- one\n- two\n- three"
    val symbols = ("the " * 30) + ("# " * 10) + "and be"
    val ellipsisDoc = ("the and " * 20) + "\nline one...\nline two…\nplain"
    val docs = Seq(
      (1L, good), (2L, short), (3L, bullets), (4L, symbols),
      (5L, ellipsisDoc), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = QualityRules.gopherRules(docs, col("doc_id"), col("text"),
      minWords = 30)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 40 words, all length 3-4, 'the' only stopword → fails
    // ok_stop (needs 2 distinct), everything else passes
    val r1 = rows(1L)
    assert(r1.getLong(r1.fieldIndex("n_words")) == 40L)
    assert(r1.getLong(r1.fieldIndex("sum_word_len")) == 20 * 3 + 20 * 4)
    assert(r1.getLong(r1.fieldIndex("stop_hits")) == 1L)
    assert(r1.getBoolean(r1.fieldIndex("ok_words")))
    assert(r1.getBoolean(r1.fieldIndex("ok_word_len")))
    assert(!r1.getBoolean(r1.fieldIndex("ok_stop")))
    assert(!r1.getBoolean(r1.fieldIndex("keep")))
    // doc 2: word-count floor
    assert(!rows(2L).getBoolean(rows(2L).fieldIndex("ok_words")))
    // doc 3: 3 bullet lines of 4 → bullet rule fails
    val r3 = rows(3L)
    assert(r3.getLong(r3.fieldIndex("n_lines")) == 4L)
    assert(r3.getLong(r3.fieldIndex("n_bullet")) == 3L)
    assert(!r3.getBoolean(r3.fieldIndex("ok_bullet")))
    // doc 4: 10 '#' over 42 words → symbol ratio ≥ 0.1 fails
    val r4 = rows(4L)
    assert(r4.getLong(r4.fieldIndex("n_symbols")) == 10L)
    assert(r4.getLong(r4.fieldIndex("n_words")) == 42L)
    assert(!r4.getBoolean(r4.fieldIndex("ok_symbol")))
    // doc 5: 2 of 4 non-empty lines end in an ellipsis (both
    // spellings) → ellipsis rule fails; counters see both forms
    val r5 = rows(5L)
    assert(r5.getLong(r5.fieldIndex("n_ell_lines")) == 2L)
    assert(!r5.getBoolean(r5.fieldIndex("ok_ellipsis")))
    // doc 6: null text → zero counters, keep = false
    val r6 = rows(6L)
    assert(r6.getLong(r6.fieldIndex("n_words")) == 0L)
    assert(r6.getLong(r6.fieldIndex("n_lines")) == 0L)
    assert(!r6.getBoolean(r6.fieldIndex("keep")))
    // the battery is pure in-row scan algebra
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "gopher battery shuffled")
    // on the real corpus: rules discriminate (both verdicts occur;
    // the synthetic vocabulary carries only 'the' of the battery, so
    // the stopword floor tunes to 1 — the query surface's setting)
    val corpus = QualityRules.gopherRules(Tables(spark, sfDir).documents,
      col("doc_id"), col("text"), minWords = 30, minStopHits = 1)
    val verdicts = corpus.groupBy("keep").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(verdicts.keySet == Set(true, false),
      s"degenerate rule battery: $verdicts")
  }

  test("LM counts: hand-checked bigram/unigram tables; marginal identity on the corpus") {
    val s = spark; import s.implicits._
    val ref = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val bg = LanguageModel.bigramCounts(ref, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(bg == Set(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)))
    val ug = LanguageModel.unigramCounts(ref, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ug == Set(("a", 2L), ("b", 2L)))
    // score "a b c d": hits ab(2), bc(1); cd OOV; sum_cu over w1 ∈
    // {a, b, c} = 2 + 2 + 0
    val scored = LanguageModel.scoreCounts(
      Seq((10L, "a b c d")).toDF("doc_id", "text"),
      col("doc_id"), col("text"),
      LanguageModel.bigramCounts(ref, col("doc_id"), col("text")),
      LanguageModel.unigramCounts(ref, col("doc_id"), col("text")))
      .collect()
    assert(scored.length == 1)
    val sc = scored.head
    assert(sc.getLong(sc.fieldIndex("n_bigrams")) == 3L)
    assert(sc.getLong(sc.fieldIndex("hits")) == 2L)
    assert(sc.getLong(sc.fieldIndex("sum_cb")) == 3L)
    assert(sc.getLong(sc.fieldIndex("sum_cu")) == 4L)
    // the conditional's books balance: Σ_w2 c(w1, w2) == c(w1),
    // exactly, on the real corpus (the denominator counts the same
    // event stream as the numerators)
    val docs = Tables(spark, sfDir).documents
    val fromBg = LanguageModel.bigramCounts(docs, col("doc_id"), col("text"))
      .groupBy("w1").agg(sum("c").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val direct = LanguageModel.unigramCounts(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fromBg == direct, "bigram marginals diverged from unigram counts")
  }

  test("stupid backoff: hand-checked resolution ladder and scores; reference-like docs rank higher") {
    val s = spark; import s.implicits._
    val ref = Seq((1L, "a b c a b d")).toDF("doc_id", "text")
    val tri = LanguageModel.trigramCounts(ref, col("doc_id"), col("text"))
    val bi = LanguageModel.bigramCounts(ref, col("doc_id"), col("text"))
    val tok = LanguageModel.tokenCounts(ref, col("doc_id"), col("text"))
    // counts core: each event at its highest known order
    val probes = Seq(
      (10L, "b c a b"),  // (b,c,a) hit3, (c,a,b) hit3
      (11L, "x a b"),    // trigram unknown, (a,b) bigram known → hit2
      (12L, "x y c"),    // only token c known → hit1
      (13L, "x y z"))    // OOV
      .toDF("doc_id", "text")
    val counts = LanguageModel.backoffCounts(probes, col("doc_id"),
        col("text"), tri, bi, tok)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(counts(10L) == ((2L, 2L, 0L, 0L)))
    assert(counts(11L) == ((1L, 0L, 1L, 0L)))
    assert(counts(12L) == ((1L, 0L, 0L, 1L)))
    assert(counts(13L) == ((1L, 0L, 0L, 0L)))
    // scores: S(c|a,b) = c(abc)/c(ab) = 1/2; S(b|c,a) = c(cab)/c(ca)
    // = 1/1; OOV floor = λ²·α/N with N = 6
    val scores = LanguageModel.stupidBackoff(
        Seq((20L, "a b c"), (21L, "c a b"), (22L, "x y z"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), tri, bi, tok,
        lambda = 0.4, alpha = 0.1)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(scores(20L) - math.log(0.5)) < 1e-12)
    assert(math.abs(scores(21L) - 0.0) < 1e-12)
    assert(math.abs(scores(22L) - math.log(0.16 * 0.1 / 6.0)) < 1e-12)
    // bigram-level backoff: "x a b" event (x,a,b) → λ·c(ab)/c(a)
    // = 0.4·2/2
    val s2 = LanguageModel.stupidBackoff(
        Seq((23L, "x a b")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), tri, bi, tok).collect().head
    assert(math.abs(s2.getDouble(2) - math.log(0.4)) < 1e-12)
    // on the real corpus: a verbatim reference doc outranks a
    // rare-token scramble
    val docs = Tables(spark, sfDir).documents
    val refSlice = docs.where(col("doc_id") % 5 === 0)
    val t2 = LanguageModel.trigramCounts(refSlice, col("doc_id"), col("text"))
    val b2 = LanguageModel.bigramCounts(refSlice, col("doc_id"), col("text"))
    val k2 = LanguageModel.tokenCounts(refSlice, col("doc_id"), col("text"))
    val likeRef = refSlice.orderBy("doc_id").select("text").as[String].head()
    val got = LanguageModel.stupidBackoff(
        Seq((900L, likeRef), (901L, "zq wv xk jy qp zq wv xk jy qp"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), t2, b2, k2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(900L) > got(901L), s"backoff did not rank ref-like doc: $got")
  }

  test("Kneser–Ney: hand-checked interpolated probabilities; diversities and counts exact; ref-like docs rank higher") {
    val s = spark; import s.implicits._
    val ref = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val bg = LanguageModel.bigramCounts(ref, col("doc_id"), col("text"))
    val ug = LanguageModel.unigramCounts(ref, col("doc_id"), col("text"))
    val ld = LanguageModel.leftDiversity(ref, col("doc_id"), col("text"))
    val rd = LanguageModel.rightDiversity(ref, col("doc_id"), col("text"))
    // type set {(a,b),(b,a),(b,c)}: L(b)=1 (only a precedes), L(a)=1,
    // L(c)=1; R(a)=1, R(b)=2
    assert(ld.as[(String, Long)].collect().toSet ==
      Set(("b", 1L), ("a", 1L), ("c", 1L)))
    assert(rd.as[(String, Long)].collect().toSet ==
      Set(("a", 1L), ("b", 2L)))
    // hand values (D=0.75, α=0.1, T=3, V2=3, Pcont = (L+0.1)/3.3):
    //   "a b": (2−D)/2 + D·R(a)/2·Pcont(b) = 0.625 + 0.375·(1.1/3.3)
    //   "b c": (1−D)/2 + D·R(b)/2·Pcont(c) = 0.125 + 0.75·(1.1/3.3)
    //   "x y": unseen context → Pcont(y) = 0.1/3.3
    val got = LanguageModel.kneserNey(
        Seq((10L, "a b"), (11L, "b c"), (12L, "x y"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), bg, ug, ld, rd,
        discount = 0.75, alpha = 0.1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val pcB = 1.1 / 3.3
    assert(math.abs(got(10L) - math.log(0.625 + 0.375 * pcB)) < 1e-12)
    assert(math.abs(got(11L) - math.log(0.125 + 0.75 * pcB)) < 1e-12)
    assert(math.abs(got(12L) - math.log(0.1 / 3.3)) < 1e-12)
    // the continuation insight is observable: after a ref where
    // "common" follows MANY contexts and "franc" is frequent but
    // follows only one, an unseen-context event prefers "common"
    // "franc" appears 3 times but always after "san" (L = 1);
    // "common" appears 3 times after 3 distinct words (L = 3)
    val ref2 = Seq((1L, "san franc east san franc west san franc " +
      "p common q common r common")).toDF("doc_id", "text")
    val args2 = (
      LanguageModel.bigramCounts(ref2, col("doc_id"), col("text")),
      LanguageModel.unigramCounts(ref2, col("doc_id"), col("text")),
      LanguageModel.leftDiversity(ref2, col("doc_id"), col("text")),
      LanguageModel.rightDiversity(ref2, col("doc_id"), col("text")))
    val kn2 = LanguageModel.kneserNey(
        Seq((20L, "zz common"), (21L, "zz franc")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), args2._1, args2._2, args2._3, args2._4)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(kn2(20L) > kn2(21L),
      s"continuation counts did not prefer the diverse word: $kn2")
    // corpus ranking: verbatim ref doc above a rare-token scramble
    val docs = Tables(spark, sfDir).documents
    val refSlice = docs.where(col("doc_id") % 5 === 0)
    val a2 = (
      LanguageModel.bigramCounts(refSlice, col("doc_id"), col("text")),
      LanguageModel.unigramCounts(refSlice, col("doc_id"), col("text")),
      LanguageModel.leftDiversity(refSlice, col("doc_id"), col("text")),
      LanguageModel.rightDiversity(refSlice, col("doc_id"), col("text")))
    val likeRef = refSlice.orderBy("doc_id").select("text").as[String].head()
    val ranks = LanguageModel.kneserNey(
        Seq((900L, likeRef), (901L, "zq wv xk jy qp zq wv xk jy qp"))
          .toDF("doc_id", "text"),
        col("doc_id"), col("text"), a2._1, a2._2, a2._3, a2._4)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(ranks(900L) > ranks(901L), s"KN did not rank ref-like doc: $ranks")
  }

  test("perplexity: analytic value on a hand example; reference-like docs rank below scrambled ones; OOV stays finite") {
    val s = spark; import s.implicits._
    val ref = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val bg = LanguageModel.bigramCounts(ref, col("doc_id"), col("text"))
    val ug = LanguageModel.unigramCounts(ref, col("doc_id"), col("text"))
    // doc "a b", α = 0.5, V = 3 bigram types:
    // P(b|a) = (2 + 0.5) / (2 + 0.5·3) = 2.5/3.5 → ppl = 3.5/2.5
    val one = LanguageModel.perplexity(
      Seq((10L, "a b")).toDF("doc_id", "text"), col("doc_id"),
      col("text"), bg, ug, alpha = 0.5).collect().head
    assert(math.abs(one.getDouble(one.fieldIndex("ppl")) - 3.5 / 2.5) < 1e-12)
    // all-OOV doc: finite perplexity under smoothing
    val oov = LanguageModel.perplexity(
      Seq((11L, "x y z")).toDF("doc_id", "text"), col("doc_id"),
      col("text"), bg, ug, alpha = 0.5).collect().head
    val oovPpl = oov.getDouble(oov.fieldIndex("ppl"))
    assert(!oovPpl.isNaN && !oovPpl.isInfinite && oovPpl > 3.5 / 2.5)
    // CCNet's ranking claim on the real corpus: train on the % 5
    // slice, then a verbatim reference-slice doc must sit below a
    // token-scrambled rare-word doc
    val docs = Tables(spark, sfDir).documents
    val refSlice = docs.where(col("doc_id") % 5 === 0)
    val b2 = LanguageModel.bigramCounts(refSlice, col("doc_id"), col("text"))
    val u2 = LanguageModel.unigramCounts(refSlice, col("doc_id"), col("text"))
    val likeRef = refSlice.orderBy("doc_id").select("text").as[String]
      .head()
    val probes = Seq((900L, likeRef), (901L, "zq wv xk jy qp zq wv xk jy qp"))
      .toDF("doc_id", "text")
    val ppl = LanguageModel.perplexity(probes, col("doc_id"), col("text"),
        b2, u2).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("ppl"))).toMap
    assert(ppl(900L) < ppl(901L),
      s"reference-like doc did not rank below rare-token doc: $ppl")
  }
}
