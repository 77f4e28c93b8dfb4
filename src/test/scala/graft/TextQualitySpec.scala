package graft

import org.apache.spark.sql.functions._

import graft.etl.Audit
import graft.functions.TextFns

class TextQualitySpec extends GraftSuite {

  test("redactPii tags emails, phones, and SSN-shaped ids") {
    val s = spark; import s.implicits._
    val got = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "call +1 (415) 555-0199 or 020 7946 0958",
      "ssn 123-45-6789 on file",
      "no pii here, just 42 and v2.0",
      // string-edge anchors: the RE2-portable phone rule uses
      // (^|[^0-9])...($|[^0-9]) capture anchors, which must fire at
      // line start and end exactly like the lookaround form did
      "555-010-1234 starts the line",
      "ends with 555-010-1234")
      .toDF("t").select(TextFns.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "call <PHONE> or <PHONE>")
    assert(got(2) == "ssn <ID> on file")
    assert(got(3) == "no pii here, just 42 and v2.0")
    assert(got(4) == "<PHONE> starts the line")
    assert(got(5) == "ends with <PHONE>")
  }

  test("topRunFraction computes the max-bigram coverage exactly") {
    val s = spark; import s.implicits._
    // "a b a b a b" -> bigrams [a b, b a, a b, b a, a b]: top = 3/5
    val df = Seq("a b a b a b", "x y z", "w w w w")
      .toDF("t")
      .select(split(col("t"), " ").as("__w"))
      .select(TextFns.bigramArray(col("__w")).as("__g"))
      .select(TextFns.topRunFraction(col("__g")).as("f"))
    val got = df.collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(3.0 / 5.0, 1.0 / 2.0, 3.0 / 3.0))
  }

  test("withAuditColumns stamps run id and user on every row") {
    val t = graft.io.Tables(spark, sfDir)
    val runId = 20260812060000L * 100
    val out = Audit.withAuditColumns(
      t.nation.select("n_nationkey"), lit(runId), "svc_etl")
    val rows = out.collect()
    assert(rows.length == t.nation.count())
    assert(rows.forall(_.getAs[Long]("RUN_ID") == runId))
    assert(rows.forall(_.getAs[String]("INSERT_USER_ID") == "svc_etl"))
    assert(out.columns.toSeq.containsSlice(Seq("RUN_ID", "ROW_INSERT_TSP",
      "ROW_UPDT_TSP", "INSERT_USER_ID", "UPDT_USER_ID")))
  }

  test("chunks: sliding windows reconstruct the text; edges are exact") {
    val s = spark; import s.implicits._
    val size = 10; val overlap = 3; val stride = size - overlap
    val texts: Seq[Option[String]] =
      (1 to 40).map(n =>
        Some(Seq.tabulate(n)(i => ('a' + i % 26).toChar).mkString)) ++
        Seq(Some(""), None)
    val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), col("text"),
        TextFns.chunks(col("text"), size, overlap).as("ch"))
      .collect()
    out.foreach { r =>
      Option(r.getAs[String]("text")) match {
        case None => assert(r.isNullAt(2))
        case Some("") => assert(r.getSeq[String](2).isEmpty)
        case Some(t) =>
          val ch = r.getSeq[String](2)
          // count = max(1, ceil((len - overlap)/stride)): every chunk
          // past the first must contribute new characters
          val expected = math.max(1,
            ((t.length - overlap) + stride - 1) / stride)
          assert(ch.length == expected, s"len ${t.length}")
          // chunk i starts at i*stride and is ≤ size chars
          ch.zipWithIndex.foreach { case (c, i) =>
            assert(c == t.substring(i * stride,
              math.min(i * stride + size, t.length)))
          }
          // no wholly-redundant tails: chunks after the first extend
          // past the shared overlap
          assert(ch.tail.forall(_.length > overlap), s"len ${t.length}")
          // overlap-stripped concatenation reconstructs the text
          val rebuilt = ch.head + ch.tail.map(_.drop(overlap)).mkString
          assert(rebuilt == t, s"len ${t.length}")
      }
    }
  }

  test("scoreWithWeights: trained-weight array == derived weights, zero-shuffle plan") {
    val s = spark; import s.implicits._
    val docs = graft.io.Tables(spark, sfDir).documents
    val dim = 512
    // a weights array holding exactly what score() derives per
    // bucket — so the two surfaces must agree bit-for-bit
    val w = spark.range(dim)
      .select((pmod(xxhash64(col("id").cast("string")), lit(2001L))
        - 1000L).as("w"))
      .as[Long].collect().map(_.toInt)
    val trained = graft.operators.QualityModel.scoreWithWeights(
      docs, col("doc_id"), col("text"), w)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4))).toSet
    assert(rows(trained) == rows(graft.operators.QualityModel.score(
      docs, col("doc_id"), col("text"), dim)))
    // the literal array rides the plan: still not one Exchange
    trained.write.format("noop").mode("overwrite").save()
    assert(!trained.queryExecution.executedPlan.toString
      .contains("Exchange"))
  }

  // planted signal: positives draw half their tokens from a "good"
  // vocabulary, negatives from a "bad" one, both mixed with shared
  // noise — the signal lives in the hashed unigrams/bigrams the
  // trainer must weight, not in any column it can see directly
  private def plantedQualityDocs: org.apache.spark.sql.DataFrame = {
    val s = spark; import s.implicits._
    val goodV = Vector("crisp", "lucid", "cogent", "precise", "thorough")
    val badV = Vector("soggy", "garbled", "rambling", "vacuous", "turgid")
    val noise = Vector("the", "of", "report", "data", "table", "with",
      "notes", "entry", "file", "update")
    val rng = new scala.util.Random(7)
    (0 until 300).map { i =>
      val pos = i % 2 == 0
      val vocab = if (pos) goodV else badV
      val words = (0 until 12 + rng.nextInt(8)).map { _ =>
        if (rng.nextDouble() < 0.5) vocab(rng.nextInt(vocab.size))
        else noise(rng.nextInt(noise.size))
      }
      (i.toLong, words.mkString(" "), if (pos) 1 else 0)
    }.toDF("doc_id", "text", "y")
  }

  test("train: planted signal recovered on held-out docs; scoring plan unchanged") {
    val s = spark; import s.implicits._
    val docs = plantedQualityDocs
    val holdout = docs.where(col("doc_id") % 5 === 0)
    val trainSet = docs.where(col("doc_id") % 5 =!= 0)
    val w = graft.operators.QualityModel.train(trainSet, col("doc_id"),
      col("text"), col("y"), dim = 256, epochs = 25, lr = 2.0)
    assert(w.length == 256 && w.exists(_ != 0))
    assert(w.forall(x => x >= -1000 && x <= 1000))
    val scored = graft.operators.QualityModel.scoreWithWeights(
      holdout, col("doc_id"), col("text"), w)
    val joined = scored.select(col("id"), col("label"))
      .join(holdout.select(col("doc_id").as("id"), col("y")), "id")
    val acc = joined.where(col("label") === col("y")).count().toDouble /
      joined.count()
    assert(acc >= 0.9, s"held-out accuracy $acc")
    // the trained array changes nothing about the scoring plan:
    // still not one Exchange
    scored.write.format("noop").mode("overwrite").save()
    assert(!scored.queryExecution.executedPlan.toString
      .contains("Exchange"))
    // mini-batch GD (each epoch a deterministic quarter-stratum)
    // recovers the same signal: epochs scale with batchDenom so
    // every stratum is visited the same number of times
    val wMb = graft.operators.QualityModel.train(trainSet, col("doc_id"),
      col("text"), col("y"), dim = 256, epochs = 100, lr = 2.0,
      batchDenom = 4)
    val accMb = graft.operators.QualityModel.scoreWithWeights(
        holdout, col("doc_id"), col("text"), wMb)
      .select(col("id"), col("label"))
      .join(holdout.select(col("doc_id").as("id"), col("y")), "id")
      .where(col("label") === col("y")).count().toDouble /
      holdout.count()
    assert(accMb >= 0.9, s"mini-batch held-out accuracy $accMb")
    // warm start: full-batch GD is deterministic, so continuing 10
    // epochs from the 15-epoch raw weights IS the straight-through
    // 25-epoch result, element for element — the property that makes
    // a daily re-fit from yesterday's persisted weights trustworthy
    val w15 = graft.operators.QualityModel.trainRaw(trainSet,
      col("doc_id"), col("text"), col("y"), dim = 256, epochs = 15,
      lr = 2.0)
    val w25resumed = graft.operators.QualityModel.trainRaw(trainSet,
      col("doc_id"), col("text"), col("y"), dim = 256, epochs = 10,
      lr = 2.0, initWeights = w15)
    val w25straight = graft.operators.QualityModel.trainRaw(trainSet,
      col("doc_id"), col("text"), col("y"), dim = 256, epochs = 25,
      lr = 2.0)
    // double sums merge in shuffle-arrival order, so cross-run bit
    // equality is not guaranteed — assert a tight bound on the raw
    // weights and EXACT equality after quantization
    val scale = w25straight.iterator.map(math.abs).max
    val maxDiff = w25resumed.zip(w25straight)
      .iterator.map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 1e-9 * scale,
      s"warm-start continuation diverged: maxDiff=$maxDiff scale=$scale")
    assert(graft.operators.QualityModel.quantize(w25resumed).sameElements(
      graft.operators.QualityModel.quantize(w25straight)))
    assert(graft.operators.QualityModel.quantize(w25straight)
      .sameElements(w))
  }

  test("train: the L-BFGS history fold converges in a quarter of GD's epochs") {
    val s = spark; import s.implicits._
    val docs = plantedQualityDocs
    val holdout = docs.where(col("doc_id") % 5 === 0)
    val trainSet = docs.where(col("doc_id") % 5 =!= 0)
    def heldOutAcc(w: Array[Int]): Double = {
      val scored = graft.operators.QualityModel.scoreWithWeights(
        holdout, col("doc_id"), col("text"), w)
      val joined = scored.select(col("id"), col("label"))
        .join(holdout.select(col("doc_id").as("id"), col("y")), "id")
      joined.where(col("label") === col("y")).count().toDouble /
        joined.count()
    }
    // 6 epochs where the GD test needs 25: the curvature history
    // earns its extra loss passes
    val w = graft.operators.QualityModel.train(trainSet, col("doc_id"),
      col("text"), col("y"), dim = 256, epochs = 6, lr = 2.0,
      historySize = 5)
    val acc = heldOutAcc(w)
    assert(acc >= 0.9, s"L-BFGS held-out accuracy $acc at 6 epochs")
    // plain GD at the same 6-epoch budget has not separated yet —
    // the comparison that justifies the fold's existence
    val accGd = heldOutAcc(graft.operators.QualityModel.train(trainSet,
      col("doc_id"), col("text"), col("y"), dim = 256, epochs = 6,
      lr = 2.0))
    assert(acc > accGd,
      s"history fold ($acc) must beat plain GD ($accGd) at equal epochs")
    // deterministic: a replay quantizes identically
    val w2 = graft.operators.QualityModel.train(trainSet, col("doc_id"),
      col("text"), col("y"), dim = 256, epochs = 6, lr = 2.0,
      historySize = 5)
    assert(w.sameElements(w2))
    // curvature pairs from different mini-batch strata would corrupt
    // the fold — the trainer refuses the combination
    intercept[IllegalArgumentException] {
      graft.operators.QualityModel.train(trainSet, col("doc_id"),
        col("text"), col("y"), dim = 256, epochs = 6, lr = 2.0,
        batchDenom = 4, historySize = 5)
    }
  }

  test("Platt calibration turns margins into probabilities; beats the naive sigmoid on held-out log-loss") {
    val s = spark; import s.implicits._
    val docs = plantedQualityDocs
    val holdout = docs.where(col("doc_id") % 5 === 0)
    val trainSet = docs.where(col("doc_id") % 5 =!= 0)
    val w = graft.operators.QualityModel.train(trainSet, col("doc_id"),
      col("text"), col("y"), dim = 256, epochs = 25, lr = 2.0)
    def scoredWithY(part: org.apache.spark.sql.DataFrame) =
      graft.operators.QualityModel
        .scoreWithWeights(part, col("doc_id"), col("text"), w)
        .join(part.select(col("doc_id").as("id"), col("y")), "id")
    val trainScored = scoredWithY(trainSet)
    val (a, b) = graft.operators.QualityModel.calibrate(
      trainScored, col("score"), col("y"))
    // higher score must mean MORE likely positive: A < 0 in
    // 1/(1+exp(A·f+B)) is monotone-increasing in f
    assert(a < 0, s"calibration slope A=$a not negative")
    // the fit is the NLL stationary point: mean predicted prob ==
    // mean smoothed target (the gB=0 optimality condition)
    val probs = graft.operators.QualityModel
      .withProbability(trainScored, a, b)
      .select(col("prob"), col("y")).as[(Double, Int)].collect()
    assert(probs.forall { case (p, _) => p > 0.0 && p < 1.0 })
    val nPos = probs.count(_._2 == 1).toDouble
    val nNeg = probs.length - nPos
    val tBar = (nPos * (nPos + 1.0) / (nPos + 2.0) +
      nNeg * (1.0 / (nNeg + 2.0))) / probs.length
    val pBar = probs.iterator.map(_._1).sum / probs.length
    assert(math.abs(pBar - tBar) < 1e-6,
      s"calibration not converged: mean prob $pBar vs mean target $tBar")
    // held-out log-loss: calibrated probabilities must beat the
    // naive uncalibrated sigmoid(score) mapping
    val ho = graft.operators.QualityModel
      .withProbability(scoredWithY(holdout), a, b)
      .select(col("score"), col("prob"), col("y"))
      .as[(Double, Double, Int)].collect()
    def nll(pairs: Seq[(Double, Int)]): Double =
      -pairs.iterator.map { case (p, y) =>
        if (y == 1) math.log(p) else math.log(1 - p)
      }.sum / pairs.length
    val calibrated = nll(ho.map(r => (r._2, r._3)).toSeq)
    val naive = nll(ho.map(r =>
      (1.0 / (1.0 + math.exp(-r._1)), r._3)).toSeq)
    System.err.println(
      f"[platt] held-out log-loss: calibrated=$calibrated%.4f naive=$naive%.4f")
    assert(calibrated < naive,
      s"calibrated NLL $calibrated did not beat naive sigmoid $naive")
    // decimal-folded sums: a re-fit is bit-identical from any layout
    val (a2, b2) = graft.operators.QualityModel.calibrate(
      trainScored.repartition(7), col("score"), col("y"))
    assert(a == a2 && b == b2,
      s"calibration not deterministic: ($a,$b) vs ($a2,$b2)")
    // the probability column does not change the scoring plan: the
    // whole gate is still zero-Exchange scan algebra
    val gated = graft.operators.QualityModel.withProbability(
      graft.operators.QualityModel.scoreWithWeights(
        holdout, col("doc_id"), col("text"), w), a, b)
    gated.write.format("noop").mode("overwrite").save()
    assert(!gated.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("quality model: fold margin == declarative explode replay, both hash families") {
    val s = spark; import s.implicits._
    val t = graft.io.Tables(spark, sfDir)
    val docs = t.documents
    for (key <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        xxhash64(_), graft.operators.QualityModel.seededKey)) {
      val got = graft.operators.QualityModel
        .score(docs, col("doc_id"), col("text"), dim = 512, key)
      // the same model via explode + groupBy-sum — the declarative
      // replay the fused in-row fold must match exactly
      val toks = docs
        .select(col("doc_id"),
          split(graft.io.Cleanser.normalized(col("text")), " ").as("w"))
        .where(size(col("w")) >= 1)
        .select(col("doc_id"),
          explode(concat(col("w"), TextFns.bigramArray(col("w")))).as("tok"))
      val replay = toks
        .select(col("doc_id"),
          (pmod(key(pmod(key(col("tok")), lit(512L)).cast("string")),
            lit(2001L)) - 1000L).as("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("margin"))
      val a = got.select("id", "n_feats", "margin").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = replay.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a.nonEmpty && a == b)
    }
    // label/score are pure functions of (margin, n_feats); the model
    // actually separates (both classes present on the corpus)
    val out = graft.operators.QualityModel
      .score(docs, col("doc_id"), col("text"), dim = 512).collect()
    assert(out.forall(r => (r.getInt(4) == 1) == (r.getLong(2) >= 0)))
    assert(out.forall(r =>
      r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1)))
    assert(out.exists(_.getInt(4) == 1) && out.exists(_.getInt(4) == 0))
  }
}
