package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.io.Tables
import graft.operators.{Dedup, Multimodal, Similarity}

class DedupSimilaritySpec extends GraftSuite {

  lazy val t = Tables(spark, sfDir)

  test("codegen DotProduct is bit-identical to the declarative fold") {
    val pairs = t.embeddings.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(t.embeddings.where(col("vec_id") === 7)
        .select(col("embedding").as("b")))
      .limit(50)
      .select(
        VectorFns.dot(col("a"), col("b")).as("fast"),
        VectorFns.dotHof(col("a"), col("b")).as("ref"))
      .collect()
    assert(pairs.nonEmpty)
    // exact bit equality, not approximate
    assert(pairs.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("jaccardPairs agrees with a brute-force check on one pair") {
    val pairs = Dedup.jaccardPairs(t.documents, col("doc_id"), col("text"),
      n = 3, threshold = 0.5).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
    // brute-force the first reported pair
    val r0 = pairs.head
    val texts = t.documents
      .where(col("doc_id").isin(r0.getLong(0), r0.getLong(1)))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(s: String): Set[String] =
      s.toLowerCase.trim.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (a, b) = (sh(texts(r0.getLong(0))), sh(texts(r0.getLong(1))))
    val expected = (a & b).size.toDouble / (a | b).size
    assert(math.abs(r0.getDouble(2) - expected) < 1e-12)
  }

  test("minhash LSH finds the true near-dup pairs") {
    val truth = Dedup.jaccardPairs(t.documents, col("doc_id"), col("text"),
        n = 3, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val est = Dedup.minhashLshPairs(t.documents, col("doc_id"), col("text"),
        n = 3, numHashes = 32, bands = 8, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every verified-signature pair should be a real 3-gram near-dup
    assert(truth.nonEmpty && est.nonEmpty)
    assert((truth intersect est).size >= (truth.size * 0.8).toInt)
  }

  test("crossNearDupPairs == self-join pairs restricted to cross pairs") {
    val emb = t.embeddings
    val planes = Similarity.axisPlanes(64, 16)
    val isBench = (idv: Long) => idv % 10 == 0
    val full = Similarity.nearDupPairs(emb, threshold = 0.4,
        planes = planes, bitsPerBand = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = full.filter { case (a, b, _) => isBench(a) ^ isBench(b) }
      .map { case (a, b, c) => (math.min(a, b), math.max(a, b), c) }.toSet
    val got = Similarity.crossNearDupPairs(
        docs = emb.where(col("vec_id") % 10 =!= 0),
        bench = emb.where(col("vec_id") % 10 === 0),
        threshold = 0.4, planes = planes, bitsPerBand = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall { case (b, d, _) => isBench(b) && !isBench(d) })
    val gotNorm = got.map { case (b, d, c) =>
      (math.min(b, d), math.max(b, d), c) }.toSet
    assert(want.nonEmpty && gotNorm == want)
  }

  test("semanticOverlap flags a planted exact copy at cosine 1.0") {
    val s = spark; import s.implicits._
    val base = t.embeddings.limit(1)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val bench = Seq((1000L, base)).toDF("vec_id", "embedding")
    val docs = Seq(
      (1L, base),                        // exact copy -> cosine 1.0
      (2L, base.map(x => -x)),           // antipode -> cosine -1, no match
      (3L, Seq.fill(base.size)(0.0f))    // zero vector -> excluded
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticOverlap(docs, bench, threshold = 0.9,
        planes = Similarity.axisPlanes(64, 16), bitsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 1L, 1.0)))
  }

  test("SigAgreeCount == declarative zip_with/filter agreement, incl. edges") {
    import graft.plans.HashExpressions
    // real signature pairs from the corpus
    val sigs = Dedup.minhashSignatures(t.documents, col("doc_id"),
      col("text"), n = 3, numHashes = 32)
    val pairs = sigs.select(col("sig").as("a"))
      .crossJoin(sigs.where(col("id") % 97 === 0).select(col("sig").as("b")))
      .limit(500)
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      size(filter(zip_with(a, b, (x, y) =>
        when(x === y, 1).otherwise(0)), v => v === 1))
    val mism = pairs.select(
        HashExpressions.sigAgree(col("a"), col("b")).as("fast"),
        hof(col("a"), col("b")).as("ref"))
      .where(col("fast") =!= col("ref")).count()
    assert(mism == 0L)
    // edge rows: null elements never count, length mismatch compares
    // the common prefix — both matching the zip_with(null-pad) form
    val edges = spark.sql(
      """SELECT array(1L, NULL, 3L) a, array(1L, 2L, 3L, 9L) b
        |UNION ALL SELECT array() , array(5L)
        |UNION ALL SELECT array(7L), array(7L)""".stripMargin)
    val got = edges.select(
        HashExpressions.sigAgree(col("a"), col("b")).as("fast"),
        hof(col("a"), col("b")).as("ref")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(got.forall { case (f, r) => f == r })
    assert(got.map(_._1).toSeq == Seq(2, 0, 1))
  }

  test("incrementalJaccardPairs == full-corpus pairs touching a new doc") {
    val docs = t.documents
    val isRef = (idv: Long) => idv % 3 == 0
    val full = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // restrict to pairs with at least one NEW member, normalized to
    // unordered (sorted) id pairs since the incremental output orients
    // ref-first rather than min-first
    val want = full.filter { case (a, b, _) => !isRef(a) || !isRef(b) }
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    val got = Dedup.incrementalJaccardPairs(
        newDocs = docs.where(col("doc_id") % 3 =!= 0),
        refDocs = docs.where(col("doc_id") % 3 === 0),
        col("doc_id"), col("text"), n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // orientation contract: id_b is always new; id_a is ref or a
    // smaller-id new doc
    assert(got.forall { case (a, b, _) =>
      !isRef(b) && (isRef(a) || a < b) })
    val gotNorm = got.map { case (a, b, j) =>
      (math.min(a, b), math.max(a, b), j) }.toSet
    assert(want.nonEmpty && gotNorm == want)
  }

  test("dedupeIncrementJaccard == full-corpus survivors when ref ids sort first") {
    // ref = doc_id < 250, new = rest: every ref id < every new id, so
    // the incremental drop policy (drop the at-risk new doc) coincides
    // with the full-corpus policy (drop id_b of every pair) restricted
    // to the new side — the equivalence the increment promises
    val docs = t.documents
    val refs = docs.where(col("doc_id") < 250)
    val news = docs.where(col("doc_id") >= 250)
    val fullDrops = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.5)
      .where(col("id_b") >= 250).select("id_b").distinct()
      .collect().map(_.getLong(0)).toSet
    val wantSurvivors = news.select("doc_id").collect()
      .map(_.getLong(0)).toSet -- fullDrops
    val got = Dedup.dedupeIncrementJaccard(news, refs,
        col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == wantSurvivors && got.nonEmpty)
  }

  test("incrementalLshPairs from a signature store == full LSH on new pairs") {
    val docs = t.documents
    val isRef = (idv: Long) => idv % 3 == 0
    val sigsOf = (d: org.apache.spark.sql.DataFrame) =>
      Dedup.minhashSignatures(d, col("doc_id"), col("text"),
        n = 3, numHashes = 32)
    // the reference side enters ONLY as (id, sig) — the stored-
    // artifact shape; no ref text reaches the incremental operator
    val refSigs = sigsOf(docs.where(col("doc_id") % 3 === 0))
      .select("id", "sig")
    val got = Dedup.incrementalLshPairs(
        sigsOf(docs.where(col("doc_id") % 3 =!= 0)), refSigs,
        numHashes = 32, bands = 8, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall { case (a, b, _) =>
      !isRef(b) && (isRef(a) || a < b) })
    val want = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
        n = 3, numHashes = 32, bands = 8, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => !isRef(a) || !isRef(b) }.toSet
    val gotNorm = got.map { case (a, b, j) =>
      (math.min(a, b), math.max(a, b), j) }.toSet
    assert(want.nonEmpty && gotNorm == want)
  }

  test("bucketed band-index store: increments join it without shuffling the store") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS sig_store")
    val docs = t.documents
    val sigsOf = (d: org.apache.spark.sql.DataFrame) =>
      Dedup.minhashSignatures(d, col("doc_id"), col("text"),
        n = 3, numHashes = 32)
    val refSigs = sigsOf(docs.where(col("doc_id") % 3 === 0))
    val newSigs = sigsOf(docs.where(col("doc_id") % 3 =!= 0))
    // the store: banded index written ONCE, bucketed by the join keys
    graft.io.Bucketing.writeBucketed(
      Dedup.bandIndex(refSigs, numHashes = 32, bands = 8),
      "sig_store", Seq("band", "bk"), buckets = 8)
    // the same index as a plain (unbucketed) parquet round-trip — the
    // control whose plan must shuffle the store side
    val plainDir = java.nio.file.Files
      .createTempDirectory("sig_plain").toString
    Dedup.bandIndex(refSigs, numHashes = 32, bands = 8)
      .write.mode("overwrite").parquet(plainDir)

    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val fromStore = Dedup.incrementalLshPairsFromIndex(newSigs,
        s.table("sig_store"), numHashes = 32, bands = 8, threshold = 0.5)
      val fromPlain = Dedup.incrementalLshPairsFromIndex(newSigs,
        s.read.parquet(plainDir), numHashes = 32, bands = 8,
        threshold = 0.5)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val a = rows(fromStore)
      assert(a.nonEmpty && a == rows(fromPlain))
      // and equal to the all-in-memory variant
      assert(a == rows(Dedup.incrementalLshPairs(newSigs, refSigs,
        numHashes = 32, bands = 8, threshold = 0.5)))
      // the point of the store: its scan arrives pre-partitioned on
      // the join keys, so the bucketed plan carries strictly fewer
      // shuffles than the identical plan over plain parquet
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString)
          .size
      assert(exchanges(fromStore) < exchanges(fromPlain),
        s"store scan still shuffles: ${exchanges(fromStore)} vs " +
          s"${exchanges(fromPlain)} exchanges")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.sql("DROP TABLE IF EXISTS sig_store")
    }
  }

  test("simhash pigeonhole banding has exact recall at maxHamming < bands") {
    val sh = Dedup.simhashes(t.documents, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, ha) <- sh; (ib, hb) <- sh if ia < ib
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val got = Dedup.simhashPairs(t.documents, col("doc_id"), col("text"),
        maxHamming = 3, bands = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute) // banding must not lose any pair
  }

  test("annTopKCosine rank-1 agrees with brute force for one query") {
    val out = Similarity.annTopKCosine(
      t.embeddings, t.embeddings.where(col("vec_id") === 3), k = 5)
      .collect().sortBy(_.getLong(1))
    assert(out.length == 5)
    val vecs = t.embeddings.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (d, na, nb) = (0.0, 0.0, 0.0)
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(3L)
    val best = vecs.filter(_._1 != 3L)
      .map { case (id, v) => id -> cos(q, v) }
      .maxBy { case (id, c) => (c, -id) }
    assert(out.head.getLong(2) == best._1)
  }

  test("TopKPairs aggregate matches the window ranking exactly") {
    import graft.plans.TopKAggregate
    import org.apache.spark.sql.expressions.Window
    val scored = t.embeddings.select(col("vec_id").as("n_id"),
        (col("vec_id") % 17).cast("double").as("score"))
      .withColumn("q_id", col("n_id") % 4)
    val viaAgg = scored.groupBy("q_id")
      .agg(TopKAggregate.topkPairs(col("score"), col("n_id"), 5).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("p.id").as("n_id"), col("p.score").as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val viaWindow = scored.withColumn("rnk",
        row_number().over(Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("n_id"))).cast("long"))
      .where(col("rnk") <= 5)
      .select("q_id", "rnk", "n_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("fused CosineArgmax assignment == declarative max_by, centroid ties and null edges included; zero Exchange") {
    import spark.implicits._
    val emb = t.embeddings.where(VectorFns.l2Norm(col("embedding")) > 0)
    val cents = Similarity.ivfCentroids(emb, numCentroids = 16,
      lloydIters = 1)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("__id").cast("long"), col("c_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    val fused = Similarity.assignTo(cents)(emb, "vec_id", "embedding", 1)
    val declarative = Similarity.assignToHof(cents)(emb, "vec_id",
      "embedding")
    assert(pairs(fused).nonEmpty && pairs(fused) == pairs(declarative),
      "fused assignment diverged from max_by")
    // the fused E-step is one scan: no Exchange in the plan (the
    // declarative form shuffles for its aggregate)
    fused.write.format("noop").mode("overwrite").save()
    assert(!fused.queryExecution.executedPlan.toString.contains("Exchange"))
    // duplicated centroids force a cosine tie on every vector — both
    // forms must resolve to the LARGER centroid id (the duplicates,
    // ids 900-901, shadow the originals)
    val dup = cents.limit(2)
      .withColumn("c_id", col("c_id") * 0 + 900 +
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("c_id")) - 1))
    val withDup = cents.unionByName(dup)
    val f2 = pairs(Similarity.assignTo(withDup)(emb, "vec_id",
      "embedding", 1))
    val d2 = pairs(Similarity.assignToHof(withDup)(emb, "vec_id",
      "embedding"))
    assert(f2 == d2)
    assert(f2.exists(_._2 >= 900), "no tie ever resolved to a duplicate")
    // null-element vectors: every margin is null on both paths, and
    // both resolve to the LARGEST centroid id (max_by over
    // struct(null, id) rows)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType, true), true)))
    val weird = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, null),
        Row(2L, (0 until 64).map(i =>
          if (i == 3) null else java.lang.Double.valueOf(1.0)))),
      schema)
    val fw = pairs(Similarity.assignTo(cents)(weird, "vec_id",
      "embedding", 1))
    val dw = pairs(Similarity.assignToHof(cents)(weird, "vec_id",
      "embedding"))
    assert(fw == dw)
    val maxId = cents.agg(max(col("c_id"))).head().getLong(0)
    assert(fw.forall(_._2 == maxId))
  }

  test("IVF probe covers the exact top-1 for most queries") {
    val queries = t.embeddings.where(col("vec_id") < 8)
    val exact = Similarity.annTopKCosine(t.embeddings, queries, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ivf = Similarity.annIvfTopK(t.embeddings, queries,
        numCentroids = 16, nProbe = 4, k = 5).collect()
    assert(ivf.nonEmpty)
    // every query produced neighbors, ranked within k
    val byQ = ivf.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    assert(ivf.forall(_.getLong(1) <= 5))
    // probing 1/4 of the partitions should still catch a fair share
    // of the true nearest neighbors (recall property, not exactness)
    val hit = byQ.count { case (q, rows) =>
      rows.exists(_.getLong(2) == exact(q))
    }
    assert(hit >= 3, s"IVF caught only $hit/8 exact top-1 neighbors")
  }

  test("connectedComponents matches brute-force union-find") {
    val pairsDf = Dedup.jaccardPairs(t.documents, col("doc_id"),
      col("text"), n = 3, threshold = 0.3)
    val pairs = pairsDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // brute-force union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val want = ids.map(id => id -> find(id)).toMap
    val got = Dedup.connectedComponents(pairsDf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("salted bucket join yields exactly the unsalted pairs") {
    def pairs(salt: Int) = Dedup.minhashLshPairs(t.documents,
        col("doc_id"), col("text"), salt = salt).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unsalted = pairs(1)
    assert(unsalted.nonEmpty)
    assert(pairs(4) == unsalted)
    def shPairs(salt: Int) = Dedup.simhashPairs(t.documents,
        col("doc_id"), col("text"), salt = salt).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shPairs(3) == shPairs(1))
  }

  test("minhash bucket cap drops oversized buckets only") {
    val capped = Dedup.minhashLshPairs(t.documents, col("doc_id"),
      col("text"), maxBucketSize = Some(2)).collect()
    val full = Dedup.minhashLshPairs(t.documents, col("doc_id"),
      col("text")).collect()
    assert(capped.length <= full.length)
  }

  test("zero-norm vectors are excluded from ANN results, not NaN-ranked") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)), // undecodable: zero vector
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.annTopKCosine(corpus,
      corpus.where(col("vec_id") === 0), k = 3).collect()
    assert(out.map(_.getLong(2)).toSet == Set(1L, 3L)) // 2 excluded
    assert(out.forall(r => !r.getDouble(3).isNaN))
  }

  test("strict embedding near-dup (0.9): exact precision, measured recall, real pruning") {
    import spark.implicits._
    // plant guaranteed near-dups: scaled copies (cosine 1.0 exactly up
    // to rounding) of 5 vectors under shifted ids
    val base = t.embeddings.where(col("vec_id") < 5)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x * 1.25f).as("embedding"))
    val emb = t.embeddings.select("vec_id", "embedding").unionByName(base)
    val planes = Similarity.axisPlanes(64, 64)
    val strict = Similarity.nearDupPairs(emb, 0.9, planes, bitsPerBand = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force ground truth at the same threshold
    val v = emb.select(col("vec_id").as("id"), col("embedding").as("e"))
      .withColumn("n", VectorFns.l2Norm(col("e"))).where(col("n") > 0)
    val a = v.select(col("id").as("id_a"), col("e").as("ea"), col("n").as("na"))
    val b = v.select(col("id").as("id_b"), col("e").as("eb"), col("n").as("nb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos",
        VectorFns.cosinePre(col("ea"), col("eb"), col("na"), col("nb")))
      .where(col("cos") >= 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 5) // the planted pairs are in the ground truth
    // precision is exact: every reported pair is a true pair
    assert(strict.subsetOf(brute))
    // recall: scaled copies agree on EVERY sign bit, so all planted
    // pairs must collide; overall recall stays high on this data
    (0 until 5).foreach(i => assert(strict.contains((i.toLong, i + 100000L))))
    assert(strict.size.toDouble >= 0.8 * brute.size)
    // pruning: threshold -1 keeps every verified candidate, so its
    // output size IS the candidate-pair count — the 8×8-bit banding
    // must examine far fewer than all pairs
    val nv = v.count()
    val candidates = Similarity
      .nearDupPairs(emb, -1.0, planes, bitsPerBand = 8).count()
    assert(candidates < 0.2 * nv * (nv - 1) / 2,
      s"banding pruned nothing: $candidates of ${nv * (nv - 1) / 2} pairs")
  }

  test("autoBandConfig holds candidate growth sublinear across rungs") {
    // expected random-candidate pairs ~ n^2 * bands / 2^bits / 2:
    // consecutive rungs must not let a 10x corpus cost more than ~5x
    // the candidates (fixed banding would cost 100x), and total bits
    // must fit the 64 axis planes
    def cand(n: Long): Double = {
      val (bands, bits) = Similarity.autoBandConfig(n)
      assert(bands * bits <= 64 && bands >= 1 && bits >= 1)
      n.toDouble * n * bands / math.pow(2, bits) / 2
    }
    assert(Similarity.autoBandConfig(5010L) == ((8, 8))) // the oracle rung
    // decades that cross a rung boundary stay far below the 100x a
    // fixed config costs (inside the first rung quadratic growth is
    // tolerated - sub-16k corpora are cheap at any banding; past the
    // last rung the 64 axis bits are spent and a deployment moves to
    // Gaussian hyperplanes with more total bits, per the scaladoc)
    for (n <- Seq(2000L, 20000L))
      assert(cand(10 * n) / cand(n) <= 25.0,
        s"rung jump at $n grows candidates ${cand(10 * n) / cand(n)}x")
    // sf0.1 -> sf1 specifically (the benched embeddings pair,
    // 2k -> 20k vectors): SUBLINEAR candidate growth in the 10x corpus
    assert(cand(20000L) / cand(2000L) < 10.0)
  }

  test("passageDedup keeps one canonical occurrence, tails always survive") {
    import spark.implicits._
    val docs = Seq(
      (0L, "q r s q r s"),        // within-doc dup: seg1 drops
      (1L, "a b c d e f g"),      // canonical holder for "a b c","d e f"
      (2L, "a b c x y z"),        // cross-doc dup of doc1 seg0
      (3L, "d e f"),              // whole doc duplicated -> empty
      (4L, "g"),                  // tail == doc1's tail: tails never dedup
      (5L, null.asInstanceOf[String]), // null text -> one empty tail
      (6L, "a b c a b c")         // both passages duplicated elsewhere
    ).toDF("doc_id", "text")
    val got = Dedup.passageDedup(docs, col("doc_id"), col("text"), k = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == (("q r s", 2L, 1L)))
    assert(got(1L) == (("a b c d e f g", 3L, 0L)))
    assert(got(2L) == (("x y z", 2L, 1L)))
    assert(got(3L) == (("", 1L, 1L)))   // fully-dropped doc keeps its row
    assert(got(4L) == (("g", 1L, 0L)))
    assert(got(5L) == (("", 1L, 0L)))
    assert(got(6L) == (("", 2L, 2L)))
  }

  test("intraDocDedup: first in-doc occurrence survives, cross-doc repeats untouched, zero shuffle") {
    import spark.implicits._
    val docs = Seq(
      (0L, "q r s q r s q r"),    // window 1 repeats window 0: dropped
      (1L, "a b c d e f"),        // no in-doc repeats
      (2L, "a b c a b c"),        // dup of ITS OWN window, not doc1's
      (3L, "a b c"),              // cross-doc repeat only: kept
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.intraDocDedup(docs, col("doc_id"), col("text"), k = 3)
    val got = out.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == (("q r s q r", 3L, 1L)))
    assert(got(1L) == (("a b c d e f", 2L, 0L)))
    assert(got(2L) == (("a b c", 2L, 1L)))
    assert(got(3L) == (("a b c", 1L, 0L))) // cross-doc scope: untouched
    assert(got(4L) == (("", 1L, 0L)))
    // the scale claim, asserted at the plan level: the whole operator
    // is scan-projection algebra — not one Exchange
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    // idempotent on the real corpus
    val corpus = t.documents
    val once = Dedup.intraDocDedup(corpus, col("doc_id"), col("text"), 8)
    val twice = Dedup.intraDocDedup(
      once.select(col("id").as("doc_id"), col("text_clean").as("text")),
      col("doc_id"), col("text"), 8)
    assert(twice.agg(sum(col("n_dropped"))).head().getLong(0) == 0L)
  }

  test("winnowing: catches shared runs at ANY alignment (where aligned windows miss); coverage invariant holds") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")
    def noise(n: Int) = Vector.fill(n)(vocab(rng.nextInt(vocab.size)))
    // a 10-token passage (≥ w + k − 1 = 8) planted at offset 3 in A
    // and offset 7 in B — different residues mod 8, so q53's aligned
    // 8-token windows see no identical window between them
    val passage = Vector("the", "quick", "brown", "fox", "jumps",
      "over", "the2", "lazy", "dog", "tonight")
    val a = (noise(3) ++ passage ++ noise(9)).mkString(" ")
    val b = (noise(7) ++ passage ++ noise(5)).mkString(" ")
    val c = noise(22).mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    // winnowing finds the pair under BOTH hash families
    for (key <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        xxhash64(_), graft.operators.QualityModel.seededKey)) {
      val pairs = Dedup.winnowCandidatePairs(docs, col("doc_id"),
          col("text"), k = 5, w = 4, hashKey = key)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"winnowing missed the pair: $pairs")
      assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
        "no shared k-gram, yet a candidate pair")
    }
    // the aligned-window mode structurally cannot see it: nothing to
    // drop between A and B (the contrast that justifies winnowing)
    val aligned = Dedup.passageDedup(docs.where(col("doc_id") < 3L),
      col("doc_id"), col("text"), k = 8)
    assert(aligned.agg(sum(col("n_dropped"))).head().getLong(0) == 0L)

    // winnowing coverage invariant on the real corpus: within each
    // doc, consecutive selected positions are at most w apart, the
    // first is within the first window and the last within the last
    // — i.e., every w-window of k-gram hashes contains a selection
    val fps = Dedup.winnowFingerprints(t.documents, col("doc_id"),
      col("text"), k = 5, w = 4)
    val byDoc = fps.select("id", "pos").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(byDoc.nonEmpty)
    val nTokens = t.documents
      .select(col("doc_id"),
        size(split(graft.io.Cleanser.normalized(col("text")), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    byDoc.foreach { case (id, ps) =>
      val lastGram = nTokens(id) - 5 // n - k
      assert(ps.head <= 3, s"doc $id first selection ${ps.head} past window 0")
      assert(ps.last >= lastGram - 3,
        s"doc $id last selection ${ps.last} misses the final window")
      ps.sliding(2).foreach {
        case Vector(p1, p2) =>
          assert(p2 - p1 <= 4, s"doc $id selection gap $p1 -> $p2 exceeds w")
        case _ =>
      }
    }
    // determinism
    val again = Dedup.winnowFingerprints(t.documents, col("doc_id"),
      col("text"), k = 5, w = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == fps.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("window-derived winnow fingerprints == the array form (ties, repeats, cutoff)") {
    import spark.implicits._
    // adversarial for the rightmost-minimum tie-break and the
    // doc-length cutoff: hyper-repetitive docs (every window is an
    // all-tie window — the selection must pick the RIGHTMOST
    // position, and distinct() must collapse identically), docs
    // exactly at/below the k + w - 1 cutoff, and normal text
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (
      Seq(
        (1L, Seq.fill(30)("spam").mkString(" ")),       // all ties
        (2L, ("x " * 20 + "spam " * 10).trim),          // tie block
        (3L, vocab(0) * 1),                             // below cutoff
        (4L, Seq.fill(8)(vocab(rng.nextInt(5))).mkString(" ")), // == cutoff (k=5,w=4)
        (5L, Seq.fill(7)(vocab(rng.nextInt(5))).mkString(" "))  // one short
      ) ++ (6L to 20L).map(i =>
        i -> Seq.fill(40)(vocab(rng.nextInt(5))).mkString(" "))
    ).toDF("doc_id", "text")
    for (key <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        xxhash64(_), graft.operators.QualityModel.seededKey)) {
      val arrayForm = Dedup.winnowFingerprints(docs, col("doc_id"),
          col("text"), k = 5, w = 4, hashKey = key)
        .select(col("id"), col("fp")).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val windowForm = Dedup.winnowFingerprintsFromKgrams(
          Dedup.kgramHashes(docs, col("doc_id"), col("text"), 5, key,
            None), w = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(windowForm == arrayForm,
        s"derivations diverge: only-window=${windowForm -- arrayForm} " +
          s"only-array=${arrayForm -- windowForm}")
      assert(arrayForm.nonEmpty)
      // cutoff: doc 5 (7 tokens < k + w - 1 = 8) selects nothing;
      // doc 4 (exactly 8) selects exactly one fingerprint position set
      assert(!arrayForm.exists(_._1 == 5L))
      assert(arrayForm.exists(_._1 == 4L))
    }
  }

  test("winnow-verified pairs: longest_run is exact (DP replay), complete at the guarantee floor, a subset of candidates") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")
    def noise(n: Int) = Vector.fill(n)(vocab(rng.nextInt(vocab.size)))
    // a 10-token passage at offsets 3 and 7 — non-aligned, run 10
    val passage = Vector("the", "quick", "brown", "fox", "jumps",
      "over", "the2", "lazy", "dog", "tonight")
    val a = (noise(3) ++ passage ++ noise(9)).mkString(" ")
    val b = (noise(7) ++ passage ++ noise(5)).mkString(" ")
    val c = noise(22).mkString(" ")
    val planted = Seq((900001L, a), (900002L, b), (900003L, c))
      .toDF("doc_id", "text")
    val docs = t.documents.select(col("doc_id"), col("text"))
      .unionByName(planted)
    val verified = Dedup.winnowVerifiedPairs(docs, col("doc_id"),
        col("text"), k = 5, w = 4, maxFpDf = Some(64))
      .as[(Long, Long, Long, Int)].collect()
    val byPair = verified.map(v => ((v._1, v._2), v._4)).toMap
    // the planted pair verifies at AT LEAST the passage length (a
    // noise token at a boundary can extend the true run past 10 —
    // the DP replay below pins exactness)
    assert(byPair.get((900001L, 900002L)).exists(_ >= 10),
      s"planted pair: ${byPair.get((900001L, 900002L))}")
    assert(!verified.exists(v => v._1 == 900003L || v._2 == 900003L))
    // every verified pair is a candidate, at the candidate's n_shared
    val cands = Dedup.winnowCandidatePairs(docs, col("doc_id"),
        col("text"), k = 5, w = 4, maxFpDf = Some(64))
      .as[(Long, Long, Long)].collect()
      .map(v => ((v._1, v._2), v._3)).toMap
    verified.foreach { case (ia, ib, n, _) =>
      assert(cands.get((ia, ib)).contains(n), s"($ia,$ib) not a candidate")
    }
    // exactness: replay each verified pair's longest shared token run
    // with a driver-side DP over the two normalized token arrays
    val ids = (verified.flatMap(v => Seq(v._1, v._2)) ++
      cands.keys.flatMap(p => Seq(p._1, p._2))).distinct.toSeq
    val toks = docs.where(col("doc_id").isin(ids: _*))
      .select(col("doc_id"),
        split(graft.io.Cleanser.normalized(col("text")), " "))
      .as[(Long, Seq[String])].collect().toMap
    def longestRun(x: Seq[String], y: Seq[String]): Int = {
      val prev = Array.fill(y.length + 1)(0)
      var best = 0
      for (i <- 1 to x.length) {
        var diag = 0
        for (j <- 1 to y.length) {
          val keep = prev(j)
          prev(j) = if (x(i - 1) == y(j - 1)) diag + 1 else 0
          if (prev(j) > best) best = prev(j)
          diag = keep
        }
      }
      best
    }
    assert(verified.nonEmpty)
    verified.foreach { case (ia, ib, _, run) =>
      assert(longestRun(toks(ia), toks(ib)) == run,
        s"pair ($ia,$ib): DP ${longestRun(toks(ia), toks(ib))} vs $run")
    }
    // completeness floor: every candidate with a DP run ≥ w + k − 1
    // is in the verified set (winnowing guarantees candidacy; the
    // verifier must then keep it)
    cands.keys.foreach { case (ia, ib) =>
      val dp = longestRun(toks.getOrElse(ia, Seq.empty),
        toks.getOrElse(ib, Seq.empty))
      if (toks.contains(ia) && toks.contains(ib) && dp >= 8)
        assert(byPair.contains((ia, ib)), s"($ia,$ib) run $dp dropped")
    }
  }

  test("containmentPairs catches an embedded document where Jaccard structurally collapses; scores exact; cap shared") {
    import spark.implicits._
    val rng = new scala.util.Random(67)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")
    def noise(n: Int) = Vector.fill(n)(vocab(rng.nextInt(vocab.size)))
    // a 12-token document embedded verbatim inside a ~10x wrapper:
    // containment(inner ⊆ wrapper) = 1.0 while Jaccard ~ 0.1
    val inner = Vector("one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine", "ten", "eleven", "twelve")
    val wrapper = (noise(55) ++ inner ++ noise(55)).mkString(" ")
    val docs = Seq((700001L, inner.mkString(" ")), (700002L, wrapper),
      (700003L, noise(40).mkString(" ")))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.8)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    val hit = cont.find(r => r._1 == 700001L && r._2 == 700002L)
    assert(hit.isDefined, s"embedded doc not caught: ${cont.toSeq}")
    // every one of the inner doc's 10 3-gram shingles appears in the
    // wrapper: cont_a == 1.0 exactly; counts are exact
    val (_, _, nc, na, _, ca2, cb2) = hit.get
    assert(na == 10 && nc == 10 && ca2 == 1.0,
      s"containment not exact: n_a=$na n_common=$nc cont_a=$ca2")
    assert(cb2 < 0.2, s"wrapper-side containment should be small: $cb2")
    // the symmetric score misses it at any workable threshold
    val jac = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(r => r._1 == 700001L && r._2 == 700002L),
      "Jaccard at 0.5 caught the embedded pair — contrast broken")
    // noise doc pairs stay out
    assert(!cont.exists(r => r._1 == 700003L || r._2 == 700003L))
    // the boilerplate cap plumbs through the shared machinery: with
    // every shingle capped out (df cap 1 on a duplicated corpus),
    // no pair survives
    val dup = Seq((1L, wrapper), (2L, wrapper)).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(dup, col("doc_id"), col("text"),
      n = 3, threshold = 0.5, maxShingleDf = Some(1)).isEmpty)
  }

  test("incremental containment == full-corpus pairs touching a new doc; id_b always new") {
    import spark.implicits._
    val docs = t.documents
    def isNew(id: Long) = id % 3 != 0
    val inc = Dedup.incrementalContainmentPairs(
        newDocs = docs.where(col("doc_id") % 3 =!= 0),
        refDocs = docs.where(col("doc_id") % 3 === 0),
        col("doc_id"), col("text"), n = 3, threshold = 0.4)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
      .toSet
    // the one-shot run restricted to pairs touching a new doc,
    // reoriented to the incremental convention (ref first; both-new
    // keep id order, scores swap with the sides)
    val full = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.4)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
      .filter { case (a, b, _, _, _, _, _) => isNew(a) || isNew(b) }
      .map { case r @ (a, b, nc, na, nb, ca2, cb2) =>
        if (isNew(a) && !isNew(b)) (b, a, nc, nb, na, cb2, ca2) else r
      }.toSet
    assert(inc.nonEmpty && inc == full,
      s"incremental containment diverged: ${inc.size} vs ${full.size}")
    assert(inc.forall { case (_, b, _, _, _, _, _) => isNew(b) })
  }

  test("containmentFromSignatures: finds the doc-in-doc pair jaccard banding misses; exact on true duplicates; bounded error vs the exact detector") {
    import spark.implicits._
    // planted: a core doc embedded verbatim in a ~4x wrapper —
    // containment 1.0 by construction, Jaccard ~0.25: the asymmetric
    // regime the estimator exists for
    val core = (1 to 17).map(i => s"core$i").mkString(" ")
    val pads = (1 to 60).map(i => s"pad$i")
    val wrapper = (pads.take(30) :+ core).mkString(" ") + " " +
      pads.drop(30).mkString(" ")
    val planted = Seq((910001L, core), (910002L, wrapper),
      (910003L, core), (910004L, pads.mkString(" "))) // 910003 = exact dup
      .toDF("doc_id", "text")
    val docs = t.documents.select(col("doc_id"), col("text"))
      .unionByName(planted)
    val sigs = Dedup.minhashSignaturesWithSize(docs, col("doc_id"),
      col("text"), n = 3, numHashes = 32).persist()
    val est = Dedup.containmentFromSignatures(sigs, numHashes = 32,
        threshold = 0.5)
      .as[(Long, Long, Double, Double, Double)].collect()
    val byPair = est.map(r => ((r._1, r._2), r)).toMap
    // the contained pair is FOUND, the CONTAINED side dominates, and
    // its score is high (not 1.0 — the estimator rides Ĵ's binomial
    // noise; this corpus draws Ĵ = 4/32 against a true J = 0.2,
    // giving cont_a = 2/3 where truth is 1.0 — the asymmetric SIGNAL
    // survives even a low draw, which is the operator's claim)
    val hit = byPair.get((910001L, 910002L))
    assert(hit.isDefined, "planted doc-in-doc pair not found")
    assert(hit.exists(h => h._4 > h._5 && h._4 >= 0.6),
      s"contained side under-scored or misoriented: $hit")
    // the exact duplicate estimates EXACTLY 1.0 (sig agreement 1 →
    // common = (n+n)/2 = n, clamped arithmetic is exact)
    val dup = byPair.get((910001L, 910003L))
    assert(dup.exists(d => d._3 == 1.0 && d._4 == 1.0 && d._5 == 1.0),
      s"exact dup not exact: $dup")
    // disjoint docs don't pair (the pads doc IS near-contained in
    // the wrapper — that pair is legitimate — but shares nothing
    // with the core)
    assert(!est.exists(r => r._2 == 910004L &&
      (r._1 == 910001L || r._1 == 910003L)))
    // CONTRAST: classic r=4 jaccard banding misses the asymmetric
    // pair (J^r collapses) — the reason containment needs its own
    // banding rung
    val jac = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
        n = 3, numHashes = 32, bands = 8, threshold = 0.2)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(r => r._1 == 910001L && r._2 == 910002L),
      "expected the jaccard bands to miss the doc-in-doc pair")
    // error vs the exact detector on pairs both surface (organic
    // corpus + plants): estimated containment within 0.4 of exact
    val exact = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.4)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => ((r._1, r._2), (r._6, r._7))).toMap
    val both = est.flatMap(r => exact.get((r._1, r._2)).map(e =>
      (math.abs(r._4 - math.min(1.0, e._1)),
        math.abs(r._5 - math.min(1.0, e._2)))))
    assert(both.nonEmpty)
    assert(both.forall { case (da, db) => da <= 0.4 && db <= 0.4 },
      s"estimator error above 0.4: ${both.maxBy(p => p._1 max p._2)}")
    // seeded (md5, oracle-replayable) path finds the planted pair too
    val seeded = Dedup.containmentFromSignatures(
        Dedup.minhashSignaturesSeededWithSize(docs, col("doc_id"),
          col("text"), n = 3, numHashes = 16),
        numHashes = 16, threshold = 0.5,
        bandKey = (_, sl) => md5(concat_ws("|", sl)))
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(seeded.exists(r => r._1 == 910001L && r._2 == 910002L),
      "seeded estimator missed the planted pair")
    assert(seeded.exists(r => r._1 == 910001L && r._2 == 910003L &&
      r._3 == 1.0 && r._4 == 1.0 && r._5 == 1.0))
    sigs.unpersist()
  }

  test("shingle-index store: FromIndex increments == from-docs, capped and uncapped; n_sh is the doc's shingle count") {
    import spark.implicits._
    val docs = t.documents
    val news = docs.where(col("doc_id") % 3 =!= 0)
    val refs = docs.where(col("doc_id") % 3 === 0)
    val refIdx = Dedup.shingleIndex(refs, col("doc_id"), col("text"), n = 3)
      .persist()
    // n_sh rides every row and equals the doc's distinct-shingle count
    val bad = refIdx.groupBy("id", "n_sh")
      .agg(count(lit(1)).as("__c"))
      .where(col("n_sh") =!= col("__c")).count()
    assert(bad == 0, s"n_sh disagrees with the row count for $bad docs")
    def jSet(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Double)].collect().toSet
    def cSet(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSet
    // uncapped: carried-n_sh path
    assert(jSet(Dedup.incrementalJaccardPairsFromIndex(news, refIdx,
        col("doc_id"), col("text"), n = 3, threshold = 0.5)) ==
      jSet(Dedup.incrementalJaccardPairs(news, refs,
        col("doc_id"), col("text"), n = 3, threshold = 0.5)))
    // capped with the cap ENGAGED (df cap 2 on the graded corpus
    // drops real shingles — asserted): recomputed-counts path
    val uncapped = cSet(Dedup.incrementalContainmentPairs(news, refs,
      col("doc_id"), col("text"), n = 3, threshold = 0.4))
    val cappedFromDocs = cSet(Dedup.incrementalContainmentPairs(news, refs,
      col("doc_id"), col("text"), n = 3, threshold = 0.4,
      maxShingleDf = Some(2)))
    assert(cappedFromDocs != uncapped,
      "df cap 2 should engage on the graded corpus")
    val cappedFromIndex = cSet(Dedup.incrementalContainmentPairsFromIndex(
      news, refIdx, col("doc_id"), col("text"), n = 3, threshold = 0.4,
      maxShingleDf = Some(2)))
    assert(cappedFromIndex.nonEmpty && cappedFromIndex == cappedFromDocs)
    refIdx.unpersist()
  }

  test("repeatedSpans == brute-force ExactSubstr; strip removes exactly the covered tokens") {
    import spark.implicits._
    val L = 10
    // plants: a 12-token passage shared by two docs at KNOWN offsets,
    // a within-doc repeat, a full duplicate pair, a unique doc
    val passage = (1 to 12).map(i => s"pz$i").mkString(" ")
    val docA = "ax1 ax2 ax3 " + passage + " ax4 ax5"      // passage at 3..14
    val docB = "bx1 " + passage + " bx2 bx3 bx4"          // passage at 1..12
    val rep = ((1 to 10).map(i => s"rr$i") ++ Seq("mid1", "mid2") ++
      (1 to 10).map(i => s"rr$i")).mkString(" ")           // self-repeat
    val uniq = (1 to 25).map(i => s"uq$i").mkString(" ")
    val dupText = (1 to 15).map(i => s"dp$i").mkString(" ")
    val planted = Seq((920001L, docA), (920002L, docB), (920003L, rep),
      (920004L, uniq), (920005L, dupText), (920006L, dupText))
      .toDF("doc_id", "text")
    val docs = t.documents.select(col("doc_id"), col("text"))
      .unionByName(planted)
    val spans = Dedup.repeatedSpans(docs, col("doc_id"), col("text"),
        minRun = L)
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap
    // shared passage: covered tokens are EXACTLY the passage
    assert(spans(920001L) == Set((3, 14)), s"${spans.get(920001L)}")
    assert(spans(920002L) == Set((1, 12)), s"${spans.get(920002L)}")
    // within-doc repeat: both occurrences covered, gap not
    assert(spans(920003L) == Set((0, 9), (12, 21)), s"${spans.get(920003L)}")
    // unique doc: no spans; full duplicates: fully covered
    assert(!spans.contains(920004L))
    assert(spans(920005L) == Set((0, 14)) && spans(920006L) == Set((0, 14)))
    // brute force over the whole corpus: a position is covered iff
    // some L-window containing it occurs >= 2 times corpus-wide
    val texts = docs.select(col("doc_id"),
        graft.io.Cleanser.normalized(col("text")).as("t"))
      .as[(Long, String)].collect()
    val freq = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    val toks = texts.map { case (i, s) =>
      i -> (if (s == null) Array.empty[String] else s.split(" ")) }
    toks.foreach { case (_, w) =>
      (0 to w.length - L).foreach(i =>
        freq(w.slice(i, i + L).mkString(" ")) += 1) }
    val want = toks.flatMap { case (i, w) =>
      val cov = (0 to w.length - L)
        .filter(p => freq(w.slice(p, p + L).mkString(" ")) >= 2)
        .flatMap(p => p until p + L).toSet
      if (cov.isEmpty) None else {
        // merge into maximal intervals
        val sorted = cov.toVector.sorted
        val iv = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
        sorted.foreach { p =>
          if (iv.nonEmpty && iv.last._2 == p - 1)
            iv(iv.size - 1) = (iv.last._1, p)
          else iv += ((p, p))
        }
        Some(i -> iv.toSet)
      }
    }.toMap
    assert(spans == want, "spans diverge from brute-force ExactSubstr")
    // strip: kept text == brute-filtered tokens; totals reconcile
    val stripped = Dedup.stripRepeatedSpans(docs, col("doc_id"),
        col("text"), minRun = L)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    toks.foreach { case (i, w) =>
      val covered = want.get(i).map(_.flatMap { case (a, b) => a to b })
        .getOrElse(Set.empty[Int])
      val keep = w.zipWithIndex.collect {
        case (tk, p) if !covered(p) => tk }
      val (_, kt, nk, nd) = stripped(i)
      assert(kt == keep.mkString(" "), s"doc $i kept text diverges")
      assert(nk == keep.length && nd == w.length - keep.length,
        s"doc $i counts: $nk/$nd vs ${keep.length}/${w.length}")
    }
    assert(stripped(920005L)._3 == 0 && stripped(920005L)._2 == "")
    // hash-family independence: xxhash64 and seeded spans agree
    val seeded = Dedup.repeatedSpans(docs, col("doc_id"), col("text"),
        minRun = L, hashKey = graft.operators.QualityModel.seededKey)
      .as[(Long, Int, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap
    assert(seeded == spans)
  }

  test("repeatedSpans is plan-invariant up the scale ladder: forced SMJ == default (broadcast) results") {
    import spark.implicits._
    // the dup-gram join is deliberately unhinted (scaladoc): AQE
    // broadcasts the duplicated-gram set while it fits and degrades
    // to a shuffled join when the corpus outgrows the threshold.
    // Pin both rungs: identical spans, and the forced rung really is
    // a non-broadcast join.
    val passage = (1 to 12).map(i => s"lz$i").mkString(" ")
    val planted = Seq((940001L, "aa1 aa2 " + passage),
      (940002L, passage + " bb1 bb2")).toDF("doc_id", "text")
    val docs = t.documents.select(col("doc_id"), col("text"))
      .unionByName(planted)
    def spanSet(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Int, Int, Int)].collect().toSet
    val spans = Dedup.repeatedSpans(docs, col("doc_id"), col("text"),
      minRun = 10)
    val defaultRun = spanSet(spans)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val forced = Dedup.repeatedSpans(docs, col("doc_id"), col("text"),
        minRun = 10)
      val plan = forced.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        "threshold -1 should force the shuffled-join rung")
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), s"unexpected join rung:\n$plan")
      assert(spanSet(forced) == defaultRun,
        "span set changed across the join-strategy ladder")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(defaultRun.contains((940001L, 2, 13, 12)) &&
      defaultRun.contains((940002L, 0, 11, 12)))
  }

  test("incremental spans == one-shot on the union restricted to new docs; stored counts anchor what the batch alone cannot") {
    import spark.implicits._
    val passage = (1 to 14).map(i => s"qq$i").mkString(" ")
    // the passage lives ONCE in the reference (930000 % 3 == 0) and
    // once in the new batch (930001): only the union count reaches 2
    val planted = Seq(
      (930000L, "rn1 rn2 " + passage + " rn3"),
      (930001L, "nn1 " + passage + " nn2 nn3"))
      .toDF("doc_id", "text")
    val docs = t.documents.select(col("doc_id"), col("text"))
      .unionByName(planted)
    val news = docs.where(col("doc_id") % 3 =!= 0)
    val refs = docs.where(col("doc_id") % 3 === 0)
    def spanSet(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, Int, Int, Int)].collect().toSet
    val inc = spanSet(Dedup.incrementalRepeatedSpans(news,
      Dedup.gramCounts(refs, col("doc_id"), col("text"), minRun = 10),
      col("doc_id"), col("text"), minRun = 10))
    val full = spanSet(Dedup.repeatedSpans(docs, col("doc_id"),
        col("text"), minRun = 10))
      .filter(_._1 % 3 != 0)
    assert(inc.nonEmpty && inc == full,
      s"incremental diverged: ${inc.size} vs ${full.size}")
    // the planted cross-side passage is found (positions 1..14 in
    // the new doc) — and would NOT be without the store's counts
    assert(inc.contains((930001L, 1, 14, 14)))
    val noStore = spanSet(Dedup.incrementalRepeatedSpans(news,
      Dedup.gramCounts(refs.limit(0), col("doc_id"), col("text"),
        minRun = 10),
      col("doc_id"), col("text"), minRun = 10))
    assert(!noStore.exists(_._1 == 930001L),
      "the cross-side span should need the stored counts")
  }

  test("softDedupWeights == brute-force string-window stats; seeded == xxhash64; consistent with repeatedSpans") {
    import spark.implicits._
    val L = 10
    // plants: a shared passage, a full-dup pair, a unique doc (the
    // q116 corpus shape — soft dedup is that criterion aggregated
    // to doc granularity)
    val passage = (1 to 12).map(i => s"sw$i").mkString(" ")
    val planted = Seq(
      (950001L, "sa1 sa2 sa3 " + passage + " sa4 sa5"),
      (950002L, "sb1 " + passage + " sb2 sb3 sb4"),
      (950003L, (1 to 25).map(i => s"su$i").mkString(" ")),
      (950004L, (1 to 15).map(i => s"sd$i").mkString(" ")),
      (950005L, (1 to 15).map(i => s"sd$i").mkString(" ")))
      .toDF("doc_id", "text")
    val docs = t.documents.select(col("doc_id"), col("text"))
      .unionByName(planted)
    val got = graft.operators.Dedup.softDedupWeights(docs, col("doc_id"),
        col("text"), minRun = L, lambda = 4.0)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // brute force by window STRING (not hash): corpus frequency per
    // window, then per-doc occurrence sums
    val texts = docs.select(col("doc_id"),
        graft.io.Cleanser.normalized(col("text")).as("tx"))
      .as[(Long, String)].collect()
    val toks = texts.map { case (i, s) =>
      i -> (if (s == null) Array.empty[String] else s.split(" ")) }
    val freq = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    def windows(w: Array[String]): Seq[String] =
      (0 to w.length - L).map(i => w.slice(i, i + L).mkString(" "))
    toks.foreach { case (_, w) =>
      if (w.length >= L) windows(w).foreach(freq(_) += 1L) }
    val want = toks.filter(_._2.length >= L).map { case (id, w) =>
      val ws = windows(w)
      val n = ws.length.toLong
      val dups = ws.filter(freq(_) >= 2L)
      val nd = dups.length.toLong
      val mass = dups.map(freq).sum
      val ratio = nd.toDouble / n.toDouble
      id -> ((n, nd, mass, ratio, 1.0 / (1.0 + 4.0 * ratio)))
    }.toMap
    assert(got == want, s"soft stats diverged: ${got.size} vs ${want.size}")
    // the plants behave per construction: full dups are ratio-1 at
    // the floor weight 1/(1+4), the unique doc is pristine at 1.0,
    // the passage pair carries partial duplication strictly between
    assert(got(950004L)._4 == 1.0 && got(950004L)._5 == 0.2)
    assert(got(950003L)._4 == 0.0 && got(950003L)._5 == 1.0)
    assert(got(950001L)._4 > 0.0 && got(950001L)._4 < 1.0)
    // n_dup > 0 EXACTLY on the docs the span detector flags (same
    // criterion, doc granularity)
    val spanDocs = graft.operators.Dedup.repeatedSpans(docs,
        col("doc_id"), col("text"), minRun = L)
      .select("id").as[Long].collect().toSet
    assert(got.filter(_._2._2 > 0).keySet == spanDocs,
      "soft-dedup flagged docs != span-flagged docs")
    // hash-family independence: the seeded twin computes identical
    // statistics (collisions aside, the hash only names the window)
    val seeded = graft.operators.Dedup.softDedupWeights(docs,
        col("doc_id"), col("text"), minRun = L, lambda = 4.0,
        hashKey = graft.operators.QualityModel.seededKey)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(seeded == got)
  }

  test("perDocSoftDedupWeights: brute parity, re-batching invariance, store anchoring, empty-store == per-single-doc") {
    import spark.implicits._
    val L = 10
    val passage = (1 to 12).map(i => s"pw$i").mkString(" ")
    val planted = Seq(
      (960000L, "rp1 " + passage + " rp2"),            // ref side
      (960001L, "np1 " + passage + " np2 np3"),        // batch: dup vs ref
      (960002L, ((1 to 10).map(i => s"nr$i") ++ Seq("gx") ++
        (1 to 10).map(i => s"nr$i")).mkString(" ")))   // batch: self-repeat
      .toDF("doc_id", "text")
    val docs = t.documents.select(col("doc_id"), col("text"))
      .unionByName(planted)
    val refs = docs.where(col("doc_id") % 3 === 0)
    val news = docs.where(col("doc_id") % 3 =!= 0)
    val store = graft.operators.Dedup.gramCounts(refs, col("doc_id"),
      col("text"), minRun = L)
    def stats(d: org.apache.spark.sql.DataFrame,
              st: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.perDocSoftDedupWeights(d, st, col("doc_id"),
          col("text"), minRun = L)
        .as[(Long, Long, Long, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val got = stats(news, store)
    // brute force with union semantics per doc: tot = within + ref
    def toksOf(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), graft.io.Cleanser.normalized(col("text"))
        .as("tx")).as[(Long, String)].collect()
      .map { case (i, s) =>
        i -> (if (s == null) Array.empty[String] else s.split(" ")) }
    def windows(w: Array[String]): Seq[String] =
      (0 to w.length - L).map(i => w.slice(i, i + L).mkString(" "))
    val refFreq = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    toksOf(refs).foreach { case (_, w) =>
      if (w.length >= L) windows(w).foreach(refFreq(_) += 1L) }
    def bruteOf(withStore: Boolean) =
      toksOf(news).filter(_._2.length >= L).map { case (id, w) =>
        val ws = windows(w)
        val within = ws.groupBy(identity).view.mapValues(_.length.toLong)
        val tot = ws.map(x =>
          within(x) + (if (withStore) refFreq(x) else 0L))
        val n = ws.length.toLong
        val nd = tot.count(_ >= 2L).toLong
        val mass = tot.filter(_ >= 2L).sum
        val ratio = nd.toDouble / n.toDouble
        id -> ((n, nd, mass, ratio, 1.0 / (1.0 + 4.0 * ratio)))
      }.toMap
    assert(got == bruteOf(withStore = true), "union-semantics parity")
    // re-batching invariance: weights never depend on batch-mates
    val b1 = stats(news.where(col("doc_id") % 2 === 0), store)
    val b2 = stats(news.where(col("doc_id") % 2 =!= 0), store)
    assert((b1 ++ b2) == got, "weights changed under re-batching")
    // the cross-side plant is anchored ONLY by the store's counts;
    // the self-repeat flags either way
    assert(got(960001L)._2 > 0, "cross-side dup missed with the store")
    val emptyStore = graft.operators.Dedup.gramCounts(refs.limit(0),
      col("doc_id"), col("text"), minRun = L)
    val noStore = stats(news, emptyStore)
    assert(noStore(960001L)._2 == 0, "cross-side dup needs the store")
    assert(noStore(960002L)._2 > 0, "self-repeat must flag storeless")
    // empty store == per-single-doc one-shot statistics
    assert(noStore == bruteOf(withStore = false),
      "empty-store form != per-single-doc soft stats")
  }

  test("winnow verify: maxHashPerDoc bounds repetitive text, keeps the spam pair, and is a no-op below the cap") {
    import spark.implicits._
    // two spam docs of one repeated token: every k-gram hashes
    // identically, so the UNGUARDED verify join would match them in
    // (n-k+1)² rows — ~120k for 350 tokens, quadratic in doc length;
    // exactly the input class the cap exists for
    val spam = Vector.fill(350)("spam").mkString(" ")
    val docs = Seq((800001L, spam), (800002L, spam),
      (800003L, Vector.fill(30)("clean").mkString(" ") + " tail one two"))
      .toDF("doc_id", "text")
    // the capped verify-side frame holds exactly cap rows per
    // (doc, hash) — the matched join is bounded at cap² per pair
    val kg = Dedup.kgramHashes(docs, col("doc_id"), col("text"),
      k = 5, hashKey = xxhash64(_), maxHashPerDoc = Some(64))
    val perDoc = kg.groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(perDoc(800001L) == 64L && perDoc(800002L) == 64L,
      s"cap not applied: $perDoc")
    // and they are the FIRST cap positions, so runs measure from the
    // region's start
    val pos = kg.where(col("id") === 800001L).select("pos")
      .as[Int].collect().sorted.toVector
    assert(pos == (0 until 64).toVector, s"not the first 64: $pos")
    // the spam pair still VERIFIES (kept, not dropped) — run
    // measured conservatively as exactly cap + k − 1 (the cap is an
    // explicit opt-in; the operator default is None = exact)
    val verified = Dedup.winnowVerifiedPairs(docs, col("doc_id"),
        col("text"), k = 5, w = 4, maxFpDf = Some(64),
        maxHashPerDoc = Some(64))
      .as[(Long, Long, Long, Int)].collect()
    val spamRun = verified.collectFirst {
      case (800001L, 800002L, _, run) => run }
    assert(spamRun.contains(64 + 5 - 1),
      s"spam pair run: $spamRun, want Some(68)")
    // on the organic corpus (no within-doc k-gram repeats past 64)
    // the cap is a NO-OP: capped == uncapped, row for row
    def runs(cap: Option[Int]) = Dedup.winnowVerifiedPairs(t.documents,
        col("doc_id"), col("text"), k = 5, w = 4, maxFpDf = Some(64),
        maxHashPerDoc = cap)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(runs(Some(64)) == runs(None))
  }

  test("incremental winnowing == full-corpus pairs touching a new doc, reoriented") {
    import spark.implicits._
    val docs = t.documents
    val ref = docs.where(col("doc_id") % 3 === 0)
    val batch = docs.where(col("doc_id") % 3 =!= 0)
    val refFps = Dedup.winnowFingerprints(ref, col("doc_id"), col("text"),
        k = 5, w = 4)
      .select(col("id"), col("fp")).distinct()
    val inc = Dedup.incrementalWinnowPairs(batch, col("doc_id"),
        col("text"), refFps, k = 5, w = 4, maxFpDf = Some(64))
      .as[(Long, Long, Long)].collect().toSet
    // the full one-shot run, restricted to pairs touching a new doc
    // and reoriented (ref id first; both-new keep id order)
    def isNew(id: Long) = id % 3 != 0
    val full = Dedup.winnowCandidatePairs(docs, col("doc_id"),
        col("text"), k = 5, w = 4, maxFpDf = Some(64))
      .as[(Long, Long, Long)].collect()
      .filter { case (a, b, _) => isNew(a) || isNew(b) }
      .map { case (a, b, n) =>
        if (isNew(a) && !isNew(b)) (b, a, n) else (a, b, n)
      }.toSet
    assert(inc.nonEmpty && inc == full,
      s"incremental diverged: ${inc.size} vs ${full.size} pairs")
    // orientation: id_b is always a new doc
    assert(inc.forall { case (_, b, _) => isNew(b) })
  }

  test("cdcDedup: insertion-robust where aligned windows are blind; reassembly exact; chunk length tracks divisor") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")
    val aToks = Vector.fill(200)(vocab(rng.nextInt(vocab.size)))
    val a = aToks.mkString(" ")
    val b = ("inserted " + a) // one token at the head
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // aligned 8-token windows: every window of B is shifted — the
    // passage mode structurally sees nothing between A and B
    val aligned = Dedup.passageDedup(docs, col("doc_id"), col("text"),
      k = 8)
    assert(aligned.agg(sum(col("n_dropped"))).head().getLong(0) == 0L)
    // CDC: boundaries are content-local, so every chunk after B's
    // first boundary equals an A chunk and dedups away
    val cdc = Dedup.cdcDedup(docs, col("doc_id"), col("text"),
      k = 3, divisor = 16)
    val rows = cdc.collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val (cleanA, nA, dropA) = rows(1L)
    val (cleanB, nB, dropB) = rows(2L)
    assert(dropA == 0L && cleanA == a,
      "doc A (all-unique chunks) must reassemble byte-exactly")
    assert(dropB > 0L,
      s"CDC saw no shared chunks after a head insertion (nB=$nB)")
    // every eligible (≥ minChunk-token) B chunk except the
    // boundary-crossing head one equals an A chunk and drops; only
    // the head chunk and the always-surviving tiny chunks remain
    // (seed 41: 16 of 20 chunks drop)
    assert(dropB > nB / 2,
      s"shared chunks did not dominate the drops: $dropB of $nB")
    // the A-side canonical text is untouched and B keeps its head
    assert(cleanB.startsWith("inserted"))
    // mean chunk length tracks the divisor on the real corpus
    val corpus = Dedup.cdcDedup(t.documents, col("doc_id"), col("text"),
      k = 3, divisor = 16)
    val tokens = t.documents
      .select(sum(size(split(coalesce(col("text"), lit("")), " "))
        .cast("long"))).head().getLong(0)
    val chunks = corpus.agg(sum(col("n_chunks"))).head().getLong(0)
    val mean = tokens.toDouble / chunks
    assert(mean > 16.0 / 3 && mean < 16.0 * 3,
      s"mean chunk length $mean far from divisor 16")
    // determinism
    assert(corpus.collect().map(_.toSeq).toSet ==
      Dedup.cdcDedup(t.documents, col("doc_id"), col("text"),
        k = 3, divisor = 16).collect().map(_.toSeq).toSet)
  }

  test("semDedup: planted copies drop, cluster minima survive, every drop has an in-cluster witness") {
    val s = spark; import s.implicits._
    val emb = Tables(spark, sfDir).embeddings
      .where(graft.functions.VectorFns.l2Norm(col("embedding")) > 0)
      .select("vec_id", "embedding")
    // plant exact copies of three vectors under higher ids — cosine
    // 1.0 with their originals, same hard assignment by construction
    val copies = emb.where(col("vec_id").isin(3L, 7L, 11L))
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val vecs = emb.unionByName(copies)
    val out = Similarity.semDedup(vecs, numCentroids = 8,
      threshold = 0.4, lloydIters = 0)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == vecs.count().toInt) // one verdict per vector
    val byId = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    Seq(900003L, 900007L, 900011L).foreach { cp =>
      assert(!byId(cp)._2, s"planted copy $cp survived")
      assert(byId(cp)._1 == byId(cp - 900000L)._1,
        "copy assigned to a different cluster than its original")
    }
    // the smallest id of every cluster can never drop
    rows.groupBy(_._2).foreach { case (c, rs) =>
      val minId = rs.map(_._1).min
      assert(rs.find(_._1 == minId).get._3, s"cluster $c minimum dropped")
    }
    // witness check: every dropped vector has a smaller-id
    // same-cluster neighbor at >= threshold (driver replay)
    val vecsById = vecs.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = rows.groupBy(_._2)
    rows.filter(!_._3).foreach { case (id, c, _) =>
      val witnesses = byCluster(c).filter(o => o._1 < id &&
        cos(vecsById(o._1), vecsById(id)) >= 0.4)
      assert(witnesses.nonEmpty, s"dropped $id has no in-cluster witness")
    }
    assert(rows.count(!_._3) >= 3) // at least the planted copies drop
  }

  test("incremental CDC == full-corpus run restricted to batch docs when ref ids sort first") {
    import spark.implicits._
    val docs = t.documents
    // ref-ids-sort-first split: canonical occurrences in the full
    // run land on the ref side exactly when ref ids are smaller, so
    // the ref-always-wins incremental semantics coincide
    val cut = docs.agg(expr("percentile_approx(doc_id, 0.4)"))
      .head().get(0).toString.toDouble.toLong
    val ref = docs.where(col("doc_id") <= cut)
    val batch = docs.where(col("doc_id") > cut)
    val refChunks = Dedup.cdcChunks(ref, col("doc_id"), col("text"),
        k = 3, divisor = 16)
      .where(col("eligible")).select("ctext").distinct()
    val inc = Dedup.incrementalCdcDedup(batch, col("doc_id"),
        col("text"), refChunks, k = 3, divisor = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val full = Dedup.cdcDedup(docs, col("doc_id"), col("text"),
        k = 3, divisor = 16)
      .where(col("id") > cut)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(inc.nonEmpty && inc == full,
      s"incremental CDC diverged: ${inc.size} vs ${full.size} docs")
  }

  test("passageDedup on the corpus: token conservation and idempotence") {
    val docs = t.documents
    val out = Dedup.passageDedup(docs, col("doc_id"), col("text"), k = 8)
      .persist()
    assert(out.count() == docs.count()) // one row per input doc, always
    // dropped passage mass accounts exactly for the token delta
    // (dropped full passages carry exactly 8 tokens each)
    val delta = out
      .join(docs.select(col("doc_id").as("id"),
        when(coalesce(col("text"), lit("")) === "", 0L)
          .otherwise(size(split(col("text"), " ")).cast("long"))
          .as("n_before")), "id")
      .select(sum(col("n_before")).as("before"),
        sum(when(col("text_clean") === "", 0L)
          .otherwise(size(split(col("text_clean"), " ")).cast("long")))
          .as("after"),
        sum(col("n_dropped")).as("dropped"))
      .head()
    // every dropped passage was a FULL k-window except none: tails
    // never drop, so before - after == 8 * dropped exactly... unless a
    // doc went empty (its surviving-mass is 0 but split('') counts 0
    // above via the when-guard) — handled, so the identity is exact
    assert(delta.getLong(0) - delta.getLong(1) == 8L * delta.getLong(2))
    // idempotence: a second pass finds nothing new to drop (every
    // duplicated window already collapsed to its canonical occurrence)
    val second = Dedup.passageDedup(
      out.select(col("id"), col("text_clean").as("text")),
      col("id"), col("text"), k = 8)
    assert(second.agg(sum(col("n_dropped"))).head().getLong(0) == 0L)
    out.unpersist()
  }

  test("LSH-bucketed ANN returns same-bucket neighbors only") {
    val planes = Similarity.hyperplanes(64, 6)
    val out = Similarity.annLshTopK(
      t.embeddings, t.embeddings.where(col("vec_id") < 8), planes, k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) <= 5)) // rnk within k
  }

  test("bucketed sign-band store: embedding increments join it without shuffling the store") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS emb_store")
    val emb = t.embeddings
    val planes = Similarity.axisPlanes(64, 16)
    val newV = emb.where(col("vec_id") % 3 =!= 0)
    val refV = emb.where(col("vec_id") % 3 === 0)
    graft.io.Bucketing.writeBucketed(
      Similarity.signBandIndex(refV, planes, bitsPerBand = 2),
      "emb_store", Seq("band", "bits"), buckets = 8)
    val plainDir = java.nio.file.Files
      .createTempDirectory("emb_plain").toString
    Similarity.signBandIndex(refV, planes, bitsPerBand = 2)
      .write.mode("overwrite").parquet(plainDir)
    val prevBroadcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      def run(idx: org.apache.spark.sql.DataFrame) =
        Similarity.incrementalNearDupPairsFromIndex(newV, refV, idx,
          threshold = 0.4, planes = planes, bitsPerBand = 2)
      val fromStore = run(s.table("emb_store"))
      val fromPlain = run(s.read.parquet(plainDir))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val a = rows(fromStore)
      assert(a.nonEmpty && a == rows(fromPlain))
      assert(a == rows(Similarity.incrementalNearDupPairs(newV, refV,
        threshold = 0.4, planes = planes, bitsPerBand = 2)))
      def exchanges(df: org.apache.spark.sql.DataFrame) =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
      assert(exchanges(fromStore) < exchanges(fromPlain),
        s"store scan still shuffles: ${exchanges(fromStore)} vs " +
          s"${exchanges(fromPlain)}")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.sql("DROP TABLE IF EXISTS emb_store")
    }
  }

  test("incremental embedding near-dup == full-corpus pairs touching a new doc") {
    val emb = t.embeddings
    val planes = Similarity.axisPlanes(64, 16)
    val newV = emb.where(col("vec_id") % 3 =!= 0)
    val refV = emb.where(col("vec_id") % 3 === 0)
    val got = Similarity.incrementalNearDupPairs(newV, refV,
        threshold = 0.4, planes = planes, bitsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // expected: every full-corpus pair with >= 1 new member, the new
    // doc rotated onto id_b (a<b kept when both are new)
    val full = Similarity.nearDupPairs(emb, threshold = 0.4,
        planes = planes, bitsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def isNew(id: Long) = id % 3 != 0
    val want = full.collect {
      case (a, b) if isNew(b) => (a, b)
      case (a, b) if isNew(a) && !isNew(b) => (b, a)
    }
    assert(got.nonEmpty && got == want)
    // and nothing ref×ref leaked
    assert(got.forall { case (_, b) => isNew(b) })
  }

  test("multi-probe LSH: probes=1 is the plain bucket; recall climbs toward brute force") {
    val planes = Similarity.hyperplanes(64, 6)
    val emb = t.embeddings
    val q = emb.where(col("vec_id") < 16)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // probes = 1 degenerates to the single-bucket form, row for row
    val base = pairs(Similarity.annLshTopK(emb, q, planes, k = 5))
    assert(base ==
      pairs(Similarity.annLshMultiProbe(emb, q, planes, k = 5, probes = 1)))
    // recall against brute-force truth is monotone in probes: each
    // extra probe only ADDS candidates (disjoint buckets), so the
    // top-k can only gain true neighbors
    val truth = pairs(Similarity.annTopKCosine(emb, q, k = 5))
    def recall(p: Int) = {
      val got = pairs(Similarity.annLshMultiProbe(emb, q, planes,
        k = 5, probes = p))
      (got & truth).size.toDouble / truth.size
    }
    val r1 = recall(1); val r3 = recall(3); val r7 = recall(7)
    assert(r1 <= r3 + 1e-9 && r3 <= r7 + 1e-9,
      s"recall not monotone: $r1 / $r3 / $r7")
    assert(r7 > r1, s"probing never helped: $r1 -> $r7")
  }

  test("80-bit Gaussian rung: recall vs brute force on a generated 100k corpus") {
    // the >1.6M-vector rung (4 bands × 20 bits = 80 planes — past any
    // axis family) exercised at spec scale: 100k random dim-64
    // vectors, 150 planted exact scaled copies, 250 planted noisy
    // near-dups. At dim 64, random background pairs cannot reach
    // cosine 0.9 (P ~ 1e-22 per pair), so ground truth is exactly the
    // planted pairs — and the brute-force cross-check below confirms
    // it on a query sample.
    val s = spark; import s.implicits._
    val dim = 64
    val n = 100000L
    val base = spark.range(0, n).select(col("id"),
      array((0 until dim).map(i => randn(i * 7919L + 13)): _*).as("e"))
      .persist()
    val noisy = base.where(col("id") < 250)
      .select((col("id") + 1000000L).as("id"),
        zip_with(col("e"),
          array((0 until dim).map(i => randn(i * 104729L + 7)): _*),
          (x, d) => x + d * lit(0.12)).as("e"))
    val exact = base.where(col("id") >= 250 && col("id") < 400)
      .select((col("id") + 2000000L).as("id"),
        transform(col("e"), x => x * lit(1.25)).as("e"))
    val corpus = base.unionByName(noisy).unionByName(exact)
    // the ladder: this corpus size in production would be 1.6M-16M →
    // autoPlanes must hand back the Gaussian (4×20) family
    val (planes, bits) = Similarity.autoPlanes(2000000L, dim)
    assert(planes.size == 80 && bits == 20)
    assert(planes.exists(p => p.count(_ != 0.0) > 1)) // Gaussian, not axis
    val pairs = Similarity.nearDupPairs(corpus, threshold = 0.9,
        planes = planes, bitsPerBand = bits, idCol = "id", vecCol = "e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // precision is exact by construction (cosine-verified)...
    assert(pairs.forall(_._3 >= 0.9))
    // ...and nothing but planted pairs shows up
    assert(pairs.forall { case (a, b, _) =>
      (a < 400 && b >= 1000000L) || (a >= 1000000L && b >= 1000000L) })
    // exact scaled copies agree on every sign bit: recall 1.0, any rung
    val exactHits = pairs.count { case (a, b, _) =>
      b == a + 2000000L && a >= 250 && a < 400 }
    assert(exactHits == 150, s"exact-dup recall ${exactHits}/150")
    // noisy copies: true cosine ≈ 1/sqrt(1+0.12²·… ) ≈ 0.985; ground
    // truth = planted pairs whose verified cosine is ≥ 0.9 (brute,
    // on the 250-pair planted set)
    val truth = Similarity.annTopKCosine(base.where(col("id") < 250)
          .select(col("id").as("vec_id"), col("e").as("embedding")),
        noisy.select(col("id").as("vec_id"), col("e").as("embedding")),
        k = 1, idCol = "vec_id", vecCol = "embedding")
      .where(col("score") >= 0.9 && col("n_id") === col("q_id") - 1000000L)
      .count()
    val noisyHits = pairs.count { case (a, b, _) => b == a + 1000000L }
    assert(truth > 200, s"planted noise too strong: only $truth/250 >= 0.9")
    // analytic band recall at cosine .985: (1-acos(.985)/pi)^20 ≈ .35;
    // 1-(1-.35)^4 ≈ .82 — assert a loose floor, not the point estimate
    assert(noisyHits.toDouble / truth >= 0.5,
      s"recall $noisyHits/$truth below the (4×20) rung's floor")
    // brute-force cross-check on a 50-query sample: the random
    // background really is clean at 0.9 (ground-truth completeness)
    val bg = Similarity.annTopKCosine(
        base.where(col("id") >= 400)
          .select(col("id").as("vec_id"), col("e").as("embedding")),
        base.where(col("id") >= 400 && col("id") < 450)
          .select(col("id").as("vec_id"), col("e").as("embedding")),
        k = 1, idCol = "vec_id", vecCol = "embedding")
      .agg(max(col("score"))).head().getDouble(0)
    assert(bg < 0.9, s"background pair at cosine $bg breaks ground truth")
    base.unpersist()
  }

  test("multimodal feature extraction feeds the ANN operators") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(
      Multimodal.asPayload(t.documents), dim = 64).toDF()
    val out = Similarity.annTopKCosine(feats,
      feats.where(col("doc_id") < 3), k = 4, idCol = "doc_id")
    val rows = out.collect()
    assert(rows.length == 12) // 3 queries × 4 neighbors
    assert(rows.forall(r => !r.getDouble(3).isNaN))
  }

  test("multimodal frame sampling slices payloads without a UDF") {
    val frames = Multimodal.sampleFrames(
      Multimodal.asPayload(t.documents), frameBytes = 50, stride = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    // every sampled frame is at most frameBytes long and stride-indexed
    assert(rows.forall(_.getAs[Array[Byte]]("frame").length <= 50))
    assert(rows.forall(_.getAs[Int]("frame_idx") % 2 == 0))
  }

  test("imageio decodes real PNG/BMP/GIF headers; features feed ANN") {
    implicit val s = spark
    import spark.implicits._
    import java.awt.image.BufferedImage
    def imageBytes(w: Int, h: Int, fmt: String,
                   tpe: Int = BufferedImage.TYPE_INT_RGB): Array[Byte] = {
      val img = new BufferedImage(w, h, tpe)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 2654435761L + y * 40503L).toInt & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val payloads = Seq(
      (0L, "image", imageBytes(5, 3, "png")),
      (3L, "image", imageBytes(8, 6, "bmp")),
      (6L, "image", imageBytes(4, 2, "png", BufferedImage.TYPE_INT_ARGB)),
      (9L, "image", imageBytes(7, 7, "gif")),
      (12L, "image", imageBytes(9, 4, "png", BufferedImage.TYPE_BYTE_GRAY)),
      (15L, "image", "definitely not an image".getBytes("UTF-8")),
      (1L, "audio", Array[Byte](1, 2, 3, 4, 5))
    ).toDF("doc_id", "media_kind", "payload")
    val m = Multimodal.decode(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    // real header reads: exact dimensions and channel counts
    assert((m(0L).width, m(0L).height, m(0L).channels) == (5, 3, 3))
    assert(m(0L).decoder == "imageio" && m(0L).ok)
    assert((m(3L).width, m(3L).height, m(3L).channels) == (8, 6, 3))
    assert((m(6L).width, m(6L).height, m(6L).channels) == (4, 2, 4)) // alpha
    assert((m(9L).width, m(9L).height) == (7, 7))
    assert((m(12L).width, m(12L).height, m(12L).channels) == (9, 4, 1)) // gray
    // unrecognizable image payloads and non-image kinds take the stub
    assert(m(15L).decoder == "stub" && m(15L).ok && m(15L).channels == 0)
    assert(m(1L).decoder == "stub")
    // the same real image bytes flow on into ANN via extractFeatures
    val feats = Multimodal.extractFeatures(
      payloads.where(col("media_kind") === "image"), dim = 16).toDF()
    val out = Similarity.annTopKCosine(feats,
      feats.where(col("doc_id") < 4), k = 3, idCol = "doc_id")
    assert(out.count() == 6) // 2 queries × k=3
  }

  test("extractFeatures embeds real pixels: encoding-invariant, content-sensitive") {
    implicit val s = spark
    import spark.implicits._
    import java.awt.image.BufferedImage
    def raster(w: Int, h: Int, salt: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((x * 2654435761L + y * 40503L) ^ salt).toInt & 0xffffff)
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val same = raster(6, 5, 0)
    val other = raster(6, 5, 0x5a5a5a)
    val payloads = Seq(
      (0L, enc(same, "png")), // identical pixels, different containers
      (1L, enc(same, "bmp")),
      (2L, enc(other, "png")), // different pixels
      (3L, "not an image at all".getBytes("UTF-8")) // byte-fold fallback
    ).toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(payloads, dim = 16).collect()
      .map(r => r.doc_id -> r).toMap
    // container bytes differ wildly (different compression), but the
    // embedding is computed from decoded pixels — byte-identical vectors
    assert(f(0L).source == "pixels" && f(1L).source == "pixels")
    assert(f(0L).embedding.sameElements(f(1L).embedding))
    // and it IS a function of the pixels: different raster, different vector
    assert(f(2L).source == "pixels")
    assert(!f(0L).embedding.sameElements(f(2L).embedding))
    // undecodable payloads take the byte-fold path, flagged as such
    assert(f(3L).source == "bytes")
    assert(f(3L).embedding.exists(_ != 0f))
    // all normalized
    assert(f.values.forall(r =>
      math.abs(r.embedding.foldLeft(0.0)((a, x) => a + x * x) - 1.0) < 1e-4))
  }

  test("extractFrameFeatures decodes real MJPEG-AVI frames, frame == image path") {
    implicit val s = spark
    import spark.implicits._
    import java.awt.image.BufferedImage
    def raster(w: Int, h: Int, salt: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, ((x * 2654435761L + y * 40503L) ^ salt).toInt & 0xffffff)
      img
    }
    def jpeg(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
      bos.toByteArray
    }
    // a REAL (minimal) RIFF/AVI around MJPEG frames: LIST hdrl with an
    // avih chunk, LIST movi with 00dc frame chunks, even-aligned
    def u32le(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ u32le(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(lt: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", lt.getBytes("US-ASCII") ++ children)
    def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
      // a filled avih main header: 25 fps (40000 us/frame), real
      // frame count and dimensions at the spec'd field offsets
      val avih = new Array[Byte](56)
      u32le(40000).copyToArray(avih, 0)           // dwMicroSecPerFrame
      u32le(frames.size).copyToArray(avih, 16)    // dwTotalFrames
      u32le(6).copyToArray(avih, 32)              // dwWidth
      u32le(5).copyToArray(avih, 36)              // dwHeight
      val hdrl = list("hdrl", chunk("avih", avih))
      val movi = list("movi",
        frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body
    }
    val imgs = (0 until 4).map(i => raster(6, 5, i * 0x1111))
    val fjpg = imgs.map(jpeg)
    val payloads = Seq(
      0L -> avi(fjpg),
      1L -> avi(Seq(fjpg.head, "not a jpeg frame".getBytes("UTF-8"))),
      2L -> "not an avi".getBytes("UTF-8")).toDF("doc_id", "payload")
    val got = Multimodal.extractFrameFeatures(payloads, dim = 16)
      .collect().groupBy(_.doc_id)
    // every frame of doc 0, container order, all really decoded
    assert(got(0L).map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(got(0L).forall(_.source == "pixels"))
    // a frame embeds EXACTLY as the same JPEG passed as an image
    // payload — one fold, two surfaces
    val whole = Multimodal.extractFeatures(
        Seq(0L -> fjpg(2)).toDF("doc_id", "payload"), dim = 16)
      .collect().head
    assert(whole.source == "pixels")
    val f2 = got(0L).find(_.frame_idx == 2).get
    assert(f2.embedding.sameElements(whole.embedding))
    // an undecodable frame inside a valid container byte-folds
    val d1 = got(1L).map(f => f.frame_idx -> f.source).toMap
    assert(d1 == Map(0 -> "pixels", 1 -> "bytes"))
    // non-AVI payloads yield no frame rows at all
    assert(!got.contains(2L))
    // stride sampling keeps every stride-th frame
    val strided = Multimodal.extractFrameFeatures(
        payloads.where(col("doc_id") === 0L), dim = 16, stride = 2)
      .collect().map(_.frame_idx).sorted.toSeq
    assert(strided == Seq(0, 2))
    // decodeVideo reads the avih main header of the same container
    // (r7): real dimensions + frames×usPerFrame duration, typed path
    val meta = Multimodal.decodeVideo(payloads).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(0L).ok && meta(0L).decoder == "riff-avi")
    assert(meta(0L).width == 6 && meta(0L).height == 5)
    assert(math.abs(meta(0L).duration_sec - 4 * 0.04) < 1e-9)
    assert(!meta(2L).ok && meta(2L).decoder == "none")
  }

  test("extractFeatures decodes real PCM samples: container-invariant") {
    implicit val s = spark
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // one recording: a 440-ish Hz sine, 16-bit mono samples
    val samples: Array[Short] = Array.tabulate(800)(i =>
      (math.sin(i * 0.18) * 12000).toShort)
    def pcmBytes(bigEndian: Boolean): Array[Byte] = {
      val b = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, i) =>
        val (hi, lo) = (((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        if (bigEndian) { b(2 * i) = hi; b(2 * i + 1) = lo }
        else { b(2 * i) = lo; b(2 * i + 1) = hi }
      }
      b
    }
    def container(tpe: AudioFileFormat.Type, bigEndian: Boolean): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, bigEndian)
      val raw = pcmBytes(bigEndian)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      assert(AudioSystem.write(ais, tpe, bos) > 0, s"no $tpe writer")
      bos.toByteArray
    }
    val wav = container(AudioFileFormat.Type.WAVE, bigEndian = false)
    val aiff = container(AudioFileFormat.Type.AIFF, bigEndian = true)
    assert(!wav.sameElements(aiff)) // genuinely different containers
    val payloads = Seq(
      (0L, wav), (1L, aiff),
      (2L, "not audio either".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(payloads, dim = 16).collect()
      .map(r => r.doc_id -> r).toMap
    // both containers decode through the REAL sample path...
    assert(f(0L).source == "samples" && f(1L).source == "samples")
    // ...and the same recording embeds identically from either — the
    // canonical signed-16-bit fold erases endianness and container
    // framing, exactly like the pixel path erases PNG-vs-BMP
    assert(f(0L).embedding.sameElements(f(1L).embedding))
    assert(f(0L).embedding.exists(_ != 0f))
    // non-audio still takes the byte-fold, flagged as such
    assert(f(2L).source == "bytes")
  }

  test("byte-fold fallback == normalized byteFoldSums, bit for bit") {
    // the chain the oracle twin relies on: q_multimodal_bytefold
    // verifies the integer sums in DuckDB; THIS spec pins the
    // rows-only embedding to exactly those sums normalized — one
    // float32 rounding at the end, no accumulation-order dependence
    implicit val s = spark
    val payloads = t.documents.select(col("doc_id"),
      col("text").cast("binary").as("payload"))
    val dim = 16
    val folds = Multimodal.byteFoldSums(payloads, dim).collect()
      .groupBy(_.doc_id)
      .map { case (id, rows) =>
        val sums = new Array[Long](dim)
        rows.foreach(r => sums(r.slot) = r.fold_sum)
        id -> sums
      }
    val feats = Multimodal.extractFeatures(payloads, dim).collect()
      .map(r => r.doc_id -> r).toMap
    assert(folds.size == feats.size && folds.nonEmpty)
    folds.foreach { case (id, sums) =>
      val acc = sums.map(_ / 128.0)
      val norm = math.sqrt(acc.foldLeft(0.0)((a, x) => a + x * x))
      val expect =
        if (norm > 0) acc.map(x => (x / norm).toFloat)
        else new Array[Float](dim)
      assert(feats(id).source == "bytes")
      assert(feats(id).embedding.sameElements(expect), s"doc $id")
    }
    // every doc emits ALL dim slots (zero-filled past payload end) and
    // a consistent byte count
    val perDoc = Multimodal.byteFoldSums(payloads, dim).collect()
      .groupBy(_.doc_id)
    assert(perDoc.values.forall(_.map(_.slot).sorted.sameElements(0 until dim)))
    assert(perDoc.values.forall(rs => rs.map(_.n_bytes).distinct.length == 1))
  }

  test("fused seeded-simhash bits == declarative md5 formula, bit for bit") {
    // the fused expression must reproduce EXACTLY the conv(md5) vote
    // formula the DuckDB oracle replays — any divergence would silently
    // break q_dedup_simhash_seeded's hash parity
    val fused = Dedup.simhashBitsSeeded(t.documents, col("doc_id"), col("text"))
      .withColumnRenamed("bits", "f")
    val decl = Dedup.simhashBitsSeededDeclarative(
        t.documents, col("doc_id"), col("text"))
      .withColumnRenamed("bits", "d")
    val joined = fused.join(decl, "id").collect()
    assert(joined.length == fused.count())
    assert(joined.forall(r => r.getAs[String]("f") == r.getAs[String]("d")))
  }

  test("javax.sound decodes real WAV/AIFF headers into audio features") {
    implicit val s = spark
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def audioBytes(tpe: AudioFileFormat.Type, rate: Float, channels: Int,
                   frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(
          new Array[Byte](frames * fmt.getFrameSize)), fmt, frames)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    val payloads = Seq(
      (1L, audioBytes(AudioFileFormat.Type.WAVE, 8000f, 1, 16000)),
      (4L, audioBytes(AudioFileFormat.Type.AIFF, 44100f, 2, 44100)),
      (7L, "definitely not audio definitely".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeAudio(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    // real header reads: exact rate/channels, duration = frames/rate
    assert(m(1L).ok && m(1L).decoder == "sound")
    assert(m(1L).sample_rate == 8000f && m(1L).channels == 1)
    assert(math.abs(m(1L).duration_sec - 2.0) < 1e-9)
    assert(m(4L).ok && m(4L).sample_rate == 44100f && m(4L).channels == 2)
    assert(math.abs(m(4L).duration_sec - 1.0) < 1e-9)
    // unrecognized payloads fail loudly-typed, not with fake numbers
    assert(!m(7L).ok && m(7L).decoder == "none" && m(7L).channels == 0)
  }

  test("MP3 frame-header walk: rate/channels/duration from generated frames") {
    implicit val s = spark
    import spark.implicits._
    // frames built bit-for-bit per ISO/IEC 11172-3; lengths below are
    // hand-computed from the spec formula, NOT from the code under test:
    //   V1 L3 128kbps/44100  -> 144*128000/44100 = 417 B, 1152 smp
    //   V1 L3 192kbps/44100  -> 144*192000/44100 = 626 B, 1152 smp
    //   V2 L3  64kbps/22050  ->  72* 64000/22050 = 208 B,  576 smp
    def frame(b2: Int, b3: Int, b4: Int, len: Int): Array[Byte] = {
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte; f(1) = b2.toByte; f(2) = b3.toByte; f(3) = b4.toByte
      f
    }
    val cbr128 = frame(0xfb, 0x90, 0x00, 417) // V1 L3, brIdx 9, sr 44100, stereo
    val cbr192 = frame(0xfb, 0xb0, 0x00, 626) // V1 L3, brIdx 11
    val v2mono = frame(0xf3, 0x80, 0xc0, 208) // V2 L3, brIdx 8, sr 22050, mono
    def cat(fs: Array[Byte]*): Array[Byte] = fs.flatten.toArray
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100) // syncsafe size 100, no footer
    val payloads = Seq(
      (1L, cat(Seq.fill(40)(cbr128): _*)),                    // CBR
      (2L, cat(Seq.fill(10)(cbr128) ++ Seq.fill(10)(cbr192): _*)), // VBR
      (3L, id3 ++ cat(Seq.fill(5)(v2mono): _*)),              // ID3v2 + V2 mono
      (4L, Array[Byte]('x', 'x') ++ cat(cbr128)),             // sync NOT at 0
      (5L, cbr128.take(3))                                    // truncated header
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeAudio(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    assert(m(1L).ok && m(1L).decoder == "mp3hdr")
    assert(m(1L).sample_rate == 44100f && m(1L).channels == 2)
    assert(math.abs(m(1L).duration_sec - 40 * 1152.0 / 44100) < 1e-9)
    // VBR: duration is the exact per-frame sample sum, not a byte estimate
    assert(m(2L).ok && math.abs(m(2L).duration_sec - 20 * 1152.0 / 44100) < 1e-9)
    assert(m(3L).ok && m(3L).decoder == "mp3hdr")
    assert(m(3L).sample_rate == 22050f && m(3L).channels == 1)
    assert(math.abs(m(3L).duration_sec - 5 * 576.0 / 22050) < 1e-9)
    // recognition gate: a sync mid-buffer is not MP3, nor is a cut header
    assert(!m(4L).ok && m(4L).decoder == "none")
    assert(!m(5L).ok && m(5L).decoder == "none")
  }

  test("ADTS frame-header walk: AAC metadata; MP3/ADTS parsers mutually exclusive") {
    implicit val s = spark
    import spark.implicits._
    // headers bit-packed per ISO/IEC 13818-7 §6.2 by hand:
    // stereo LC @44100 (srIdx 4), frame len 256, 1 AAC frame (1024 smp)
    def adts(b1: Int, b2: Int, cfgLow2: Int, len: Int, fm1: Int): Array[Byte] = {
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte; f(1) = b1.toByte; f(2) = b2.toByte
      f(3) = ((cfgLow2 << 6) | ((len >> 11) & 3)).toByte
      f(4) = ((len >> 3) & 0xff).toByte
      f(5) = ((len & 7) << 5).toByte
      f(6) = fm1.toByte
      f
    }
    val stereo44k = adts(0xf1, 0x50, 2, 256, 0) // MPEG-4, LC, srIdx 4, cfg 2
    val mono8k = adts(0xf9, 0x6c, 1, 100, 1)    // MPEG-2, srIdx 11, cfg 1, 2 frames
    val mp3 = { // valid MP3 V1 L3 frame — must NOT parse as ADTS
      val f = new Array[Byte](417)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte; f(2) = 0x90.toByte
      f
    }
    def cat(fs: Seq[Array[Byte]]): Array[Byte] = fs.flatten.toArray
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 40) ++
      new Array[Byte](40)
    val payloads = Seq(
      (1L, cat(Seq.fill(20)(stereo44k))),
      (2L, id3 ++ cat(Seq.fill(5)(mono8k))),
      (3L, mp3),
      (4L, Array[Byte]('z') ++ stereo44k) // sync not at offset 0
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeAudio(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    assert(m(1L).ok && m(1L).decoder == "aachdr")
    assert(m(1L).sample_rate == 44100f && m(1L).channels == 2)
    assert(math.abs(m(1L).duration_sec - 20 * 1024.0 / 44100) < 1e-9)
    assert(m(2L).ok && m(2L).decoder == "aachdr")
    assert(m(2L).sample_rate == 8000f && m(2L).channels == 1)
    // frames-minus-1 = 1 -> 2048 samples per ADTS frame
    assert(math.abs(m(2L).duration_sec - 5 * 2048.0 / 8000) < 1e-9)
    // exclusivity both ways: ADTS layer bits 00 are MP3's reserved
    // layer, MP3's nonzero layer bits fail the ADTS gate
    assert(m(3L).ok && m(3L).decoder == "mp3hdr")
    assert(!m(4L).ok && m(4L).decoder == "none")
  }

  test("FLAC STREAMINFO parse: exact duration from the declared sample count") {
    implicit val s = spark
    import spark.implicits._
    // STREAMINFO bit-packed by hand per RFC 9639 §8.2: sr[19:0]
    // ch-1[2:0] bps-1[4:0] total[35:0] across bytes 10..17
    def flac(sr: Int, ch: Int, bps: Int, total: Long,
             lastBlock: Boolean = true): Array[Byte] = {
      val si = new Array[Byte](34)
      si(0) = 0x10; si(1) = 0x00 // min blocksize 4096
      si(2) = 0x10; si(3) = 0x00 // max blocksize
      si(10) = ((sr >> 12) & 0xff).toByte
      si(11) = ((sr >> 4) & 0xff).toByte
      si(12) = (((sr & 0xf) << 4) | (((ch - 1) & 7) << 1) |
        (((bps - 1) >> 4) & 1)).toByte
      si(13) = ((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf)).toInt.toByte
      si(14) = ((total >> 24) & 0xff).toByte
      si(15) = ((total >> 16) & 0xff).toByte
      si(16) = ((total >> 8) & 0xff).toByte
      si(17) = (total & 0xff).toByte
      val hdr = (if (lastBlock) 0x80 else 0x00).toByte
      "fLaC".getBytes("US-ASCII") ++
        Array(hdr, 0.toByte, 0.toByte, 34.toByte) ++ si
    }
    val payloads = Seq(
      (1L, flac(44100, 2, 16, 88200L)),       // 2.0 s stereo CD rate
      (2L, flac(96000, 6, 24, 0L)),           // legal unknown length
      (3L, flac(44100, 2, 16, 88200L).updated(3, 'c'.toByte)), // bad magic
      (4L, "fLaC".getBytes("US-ASCII") ++
        Array[Byte](0x84.toByte, 0, 0, 10) ++ new Array[Byte](10))
        // first block type 4 (VORBIS_COMMENT): spec says STREAMINFO
        // must come first — gate refuses rather than hunting
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeAudio(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    assert(m(1L).ok && m(1L).decoder == "flachdr")
    assert(m(1L).sample_rate == 44100f && m(1L).channels == 2)
    assert(math.abs(m(1L).duration_sec - 2.0) < 1e-9)
    assert(m(2L).ok && m(2L).decoder == "flachdr")
    assert(m(2L).sample_rate == 96000f && m(2L).channels == 6)
    assert(m(2L).duration_sec == -1.0)
    assert(!m(3L).ok && m(3L).decoder == "none")
    assert(!m(4L).ok && m(4L).decoder == "none")
  }

  test("H.264 SPS walk: width/height/fps from generated Annex-B streams") {
    implicit val s = spark
    import spark.implicits._
    // an Exp-Golomb WRITER (§9.1 in reverse), so the parser is tested
    // against independently-encoded bitstreams, not itself
    class BitW {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      private var cur = 0; private var nb = 0
      def u1(v: Int): Unit = {
        cur = (cur << 1) | (v & 1); nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 } }
      def u(v: Long, n: Int): Unit =
        (n - 1 to 0 by -1).foreach(i => u1(((v >> i) & 1).toInt))
      def ue(v: Int): Unit = {
        val k = v + 1
        val bits = 32 - Integer.numberOfLeadingZeros(k)
        (0 until bits - 1).foreach(_ => u1(0)); u(k.toLong, bits) }
      def done(): Array[Byte] = { // rbsp_stop_one_bit + alignment
        u1(1); while (nb != 0) u1(0); buf.toArray }
    }
    // encoder-side emulation prevention: 00 00 0x -> 00 00 03 0x
    def escape(b: Array[Byte]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      b.foreach { x =>
        if (out.length >= 2 && out(out.length - 1) == 0 &&
            out(out.length - 2) == 0 && (x & 0xff) <= 3)
          out += 3
        out += x
      }
      out.toArray
    }
    // baseline 64x48, no VUI -> duration unknown
    val w1 = new BitW
    w1.u(66, 8); w1.u(0, 8); w1.u(30, 8); w1.ue(0) // profile..sps_id
    w1.ue(0); w1.ue(0); w1.ue(0)  // frame_num, poc_type 0, poc_lsb
    w1.ue(1); w1.u1(0)            // max_ref, gaps
    w1.ue(3); w1.ue(2)            // 4x16=64 wide, 3x16=48 tall
    w1.u1(1); w1.u1(1); w1.u1(0); w1.u1(0) // fmo, d8x8, crop, vui
    // high-profile 1920x1080 (coded 1088, crop_bottom 4 units x2),
    // VUI timing 25 fps; num_units_in_tick=1 embeds 00 00 01 in the
    // SPS so the escape/unescape path is exercised by construction
    val w2 = new BitW
    w2.u(100, 8); w2.u(0, 8); w2.u(40, 8); w2.ue(0)
    w2.ue(1); w2.ue(0); w2.ue(0); w2.u1(0); w2.u1(0) // chroma 4:2:0…
    w2.ue(0); w2.ue(2)            // frame_num, poc_type 2 (no extras)
    w2.ue(4); w2.u1(0)
    w2.ue(119); w2.ue(67)         // 120 MBs = 1920, 68 units = 1088
    w2.u1(1); w2.u1(1)
    w2.u1(1); w2.ue(0); w2.ue(0); w2.ue(0); w2.ue(4) // crop bottom 4
    w2.u1(1)                      // vui_parameters_present
    w2.u1(0); w2.u1(0); w2.u1(0); w2.u1(0) // aspect/overscan/signal/loc
    w2.u1(1); w2.u(1, 32); w2.u(50, 32); w2.u1(1) // timing: 25 fps
    val sc4 = Array[Byte](0, 0, 0, 1)
    val sc3 = Array[Byte](0, 0, 1)
    def stream(sps: Array[Byte], slices: Int): Array[Byte] =
      sc4 ++ Array(0x67.toByte) ++ escape(sps) ++
        (0 until slices).flatMap(_ =>
          sc3 ++ Array(0x65.toByte, 0x88.toByte, 0x84.toByte)).toArray
    val payloads = Seq(
      (1L, stream(w1.done(), 0)),
      (2L, stream(w2.done(), 50)),              // 50 frames @25 -> 2 s
      (3L, Array[Byte](1, 0, 0, 1) ++ stream(w1.done(), 0)) // gate: no code at 0
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeVideo(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    assert(m(1L).ok && m(1L).decoder == "h264sps")
    assert(m(1L).width == 64 && m(1L).height == 48)
    assert(m(1L).duration_sec == -1.0) // no VUI timing declared
    assert(m(2L).ok && m(2L).width == 1920 && m(2L).height == 1080)
    assert(math.abs(m(2L).duration_sec - 2.0) < 1e-9)
    assert(!m(3L).ok && m(3L).decoder == "none")
  }

  test("H.265 SPS walk: width/height/fps from generated HEVC streams") {
    implicit val s = spark
    import spark.implicits._
    // the same independent Exp-Golomb WRITER discipline as the H.264
    // spec: streams are encoded forward from §7.3.2.2, never by the
    // parser under test
    class BitW {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
      private var cur = 0; private var nb = 0
      def u1(v: Int): Unit = {
        cur = (cur << 1) | (v & 1); nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 } }
      def u(v: Long, n: Int): Unit =
        (n - 1 to 0 by -1).foreach(i => u1(((v >> i) & 1).toInt))
      def ue(v: Int): Unit = {
        val k = v + 1
        val bits = 32 - Integer.numberOfLeadingZeros(k)
        (0 until bits - 1).foreach(_ => u1(0)); u(k.toLong, bits) }
      def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
      def done(): Array[Byte] = { u1(1); while (nb != 0) u1(0); buf.toArray }
    }
    def escape(b: Array[Byte]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      b.foreach { x =>
        if (out.length >= 2 && out(out.length - 1) == 0 &&
            out(out.length - 2) == 0 && (x & 0xff) <= 3)
          out += 3
        out += x
      }
      out.toArray
    }
    // profile_tier_level(1, 0): 88 fixed bits + level_idc
    def ptl(w: BitW): Unit = {
      w.u(0, 2); w.u1(0); w.u(1, 5)  // space, tier, Main profile
      w.u(0, 32)                      // compatibility flags
      w.u(0, 4); w.u(0, 43); w.u1(0)  // source flags + reserved
      w.u(93, 8)                      // level 3.1
    }
    // minimal main-profile 64x48, 4:2:0, no conformance window, no
    // VUI -> duration unknown
    val w1 = new BitW
    w1.u(0, 4); w1.u(0, 3); w1.u1(1)   // vps_id, max_sub_layers, nesting
    ptl(w1)
    w1.ue(0); w1.ue(1)                 // sps_id, chroma 4:2:0
    w1.ue(64); w1.ue(48); w1.u1(0)     // width, height, no conf window
    w1.ue(0); w1.ue(0); w1.ue(0)       // bit depths, log2_max_poc_lsb
    w1.u1(1); w1.ue(0); w1.ue(0); w1.ue(0) // ordering info, sub-layer 0
    w1.ue(0); w1.ue(2); w1.ue(0); w1.ue(2) // CB/TB log2 sizes
    w1.ue(0); w1.ue(0)                 // transform hierarchy depths
    w1.u1(0)                           // scaling_list_enabled
    w1.u1(0); w1.u1(0); w1.u1(0)       // amp, sao, pcm
    w1.ue(0)                           // num_short_term_ref_pic_sets
    w1.u1(0); w1.u1(0); w1.u1(0)       // long_term, tmvp, smoothing
    w1.u1(0)                           // vui_parameters_present
    // 1080p coded as 1920x1088 with a bottom conformance offset of 4
    // chroma units (x2 = 8 luma rows), parsed THROUGH every optional
    // section: full scaling-list data, two short-term RPS (the second
    // inter-predicted from the first), long-term pics, and a VUI with
    // extended SAR, signal type, chroma loc, display window, and
    // 25 fps timing; time_scale=25 writes 00 00 00 19 into the SPS so
    // the escape/unescape path is exercised by construction
    val w2 = new BitW
    w2.u(0, 4); w2.u(0, 3); w2.u1(1)
    ptl(w2)
    w2.ue(0); w2.ue(1)
    w2.ue(1920); w2.ue(1088)
    w2.u1(1); w2.ue(0); w2.ue(0); w2.ue(0); w2.ue(4) // conf: bottom 4
    w2.ue(0); w2.ue(0); w2.ue(2)       // bit depths, poc_lsb_minus4=2
    w2.u1(1); w2.ue(1); w2.ue(0); w2.ue(0)
    w2.ue(0); w2.ue(2); w2.ue(0); w2.ue(2)
    w2.ue(1); w2.ue(1)                 // transform hierarchy depths
    w2.u1(1); w2.u1(1)                 // scaling list enabled+present
    // scaling_list_data: sizeId 0-2 x 6 matrices + sizeId 3 x {0,3};
    // alternate ue reference deltas with explicit coefficient runs
    for (sizeId <- 0 to 3) {
      var matrixId = 0
      while (matrixId < 6) {
        if (matrixId % 2 == 0) { w2.u1(0); w2.ue(0) } // predicted
        else {
          w2.u1(1)
          if (sizeId > 1) w2.se(-2)    // dc coef
          val coefNum = math.min(64, 1 << (4 + (sizeId << 1)))
          (0 until coefNum).foreach(j => w2.se(if (j % 3 == 0) 1 else -1))
        }
        matrixId += (if (sizeId == 3) 3 else 1)
      }
    }
    w2.u1(0); w2.u1(1)                 // amp, sao
    w2.u1(1)                           // pcm_enabled
    w2.u(7, 4); w2.u(7, 4)             // pcm bit depths
    w2.ue(0); w2.ue(2); w2.u1(1)       // pcm CB sizes + loop filter
    w2.ue(2)                           // num_short_term_ref_pic_sets
    w2.ue(1); w2.ue(1)                 // set 0: explicit, 1 neg + 1 pos
    w2.ue(0); w2.u1(1)
    w2.ue(3); w2.u1(0)
    w2.u1(1)                           // set 1: inter-predicted
    w2.u1(0); w2.ue(0)                 // delta_rps sign + abs
    w2.u1(1)                           // j=0 used
    w2.u1(0); w2.u1(1)                 // j=1 unused but use_delta
    w2.u1(1)                           // j=2 used
    w2.u1(1); w2.ue(1)                 // long-term present, 1 pic
    w2.u(5, 6); w2.u1(1)               // poc lsb at width 4+2, used
    w2.u1(1); w2.u1(1)                 // tmvp, smoothing
    w2.u1(1)                           // vui_parameters_present
    w2.u1(1); w2.u(255, 8); w2.u(16, 16); w2.u(9, 16) // extended SAR
    w2.u1(1); w2.u1(0)                 // overscan + appropriate
    w2.u1(1); w2.u(5, 3); w2.u1(1)     // signal type: format, range
    w2.u1(1); w2.u(0x010203, 24)       // colour description
    w2.u1(1); w2.ue(0); w2.ue(1)       // chroma sample loc
    w2.u1(0); w2.u1(0); w2.u1(0)       // neutral, field_seq, frame_field
    w2.u1(1); w2.ue(1); w2.ue(1); w2.ue(1); w2.ue(1) // display window
    w2.u1(1); w2.u(1, 32); w2.u(25, 32) // timing: 25 fps
    val sc4 = Array[Byte](0, 0, 0, 1)
    val sc3 = Array[Byte](0, 0, 1)
    def hdr(tpe: Int): Array[Byte] =
      Array(((tpe << 1) & 0x7e).toByte, 0x01.toByte)
    // a picture = one leading slice (first_slice_segment_in_pic_flag
    // set, IDR_W_RADL) + one continuation slice (TRAIL_R, flag clear)
    // that must NOT count toward the duration
    def pic(): Array[Byte] =
      sc3 ++ hdr(19) ++ Array(0xAF.toByte, 0x11.toByte) ++
        sc3 ++ hdr(1) ++ Array(0x2F.toByte, 0x11.toByte)
    // real streams lead with a VPS (type 32) — the walk must find the
    // SPS past it
    def stream(sps: Array[Byte], pics: Int): Array[Byte] =
      sc4 ++ hdr(32) ++ Array(0x0c.toByte, 0x01.toByte, 0xff.toByte) ++
        sc4 ++ hdr(33) ++ escape(sps) ++
        (0 until pics).flatMap(_ => pic()).toArray
    val payloads = Seq(
      (1L, stream(w1.done(), 0)),
      (2L, stream(w2.done(), 50)),              // 50 pics @25 -> 2 s
      (3L, Array[Byte](1, 0, 0, 1) ++ stream(w1.done(), 0)) // gate
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeVideo(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    assert(m(1L).ok && m(1L).decoder == "h265sps")
    assert(m(1L).width == 64 && m(1L).height == 48)
    assert(m(1L).duration_sec == -1.0) // no VUI timing declared
    assert(m(2L).ok && m(2L).decoder == "h265sps")
    assert(m(2L).width == 1920 && m(2L).height == 1080)
    assert(math.abs(m(2L).duration_sec - 2.0) < 1e-9)
    assert(!m(3L).ok && m(3L).decoder == "none")
  }

  test("ISO-BMFF box walk decodes real MP4 headers into video features") {
    implicit val s = spark
    import spark.implicits._
    // build a container byte-for-byte per ISO/IEC 14496-12 §4.2
    def u32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tpe: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
    def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
      box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(timescale) ++
        u32(duration) ++ new Array[Byte](80)) // rate..next_track_ID
    def tkhdV0(w: Int, h: Int): Array[Byte] =
      box("tkhd", new Array[Byte](76) ++ u32(w.toLong << 16) ++
        u32(h.toLong << 16))
    def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
        u32(timescale) ++ u32(duration >> 32) ++ u32(duration & 0xffffffffL) ++
        new Array[Byte](80))
    def tkhdV1(w: Int, h: Int): Array[Byte] =
      box("tkhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](84) ++
        u32(w.toLong << 16) ++ u32(h.toLong << 16))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512) ++
      "isomiso2".getBytes("US-ASCII"))
    // audio track (0×0 dims) FIRST: the walk must skip it and take the
    // visual track's dimensions
    val mp4v0 = ftyp ++ box("moov", mvhdV0(600, 1800) ++
      box("trak", tkhdV0(0, 0)) ++ box("trak", tkhdV0(640, 360))) ++
      box("mdat", new Array[Byte](32))
    val mp4v1 = ftyp ++ box("moov", mvhdV1(90000, 45000) ++
      box("trak", tkhdV1(1920, 1080)))
    val audioOnly = ftyp ++ box("moov", mvhdV0(8000, 4000) ++
      box("trak", tkhdV0(0, 0)))
    val payloads = Seq(
      (1L, mp4v0), (4L, mp4v1), (7L, audioOnly),
      (10L, "definitely not an mp4 container here".getBytes("UTF-8")),
      (13L, mp4v0.take(20)) // truncated mid-moov
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeVideo(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    assert(m(1L).ok && m(1L).decoder == "isobmff")
    assert((m(1L).width, m(1L).height) == (640, 360))
    assert(math.abs(m(1L).duration_sec - 3.0) < 1e-9) // 1800/600
    assert(m(4L).ok && (m(4L).width, m(4L).height) == (1920, 1080))
    assert(math.abs(m(4L).duration_sec - 0.5) < 1e-9) // 45000/90000
    // audio-only container parses (like .m4a) with no visual dims
    assert(m(7L).ok && (m(7L).width, m(7L).height) == (0, 0))
    assert(math.abs(m(7L).duration_sec - 0.5) < 1e-9)
    // unrecognized / truncated payloads fail loudly-typed
    assert(!m(10L).ok && m(10L).decoder == "none")
    assert(!m(13L).ok)
    // the generic router sends video payloads through the same parser
    val routed = Multimodal.decode(
      Seq((1L, "video", mp4v0), (2L, "video", Array[Byte](9, 9, 9, 9, 9)))
        .toDF("doc_id", "media_kind", "payload")).collect()
      .map(r => r.doc_id -> r).toMap
    assert(routed(1L).decoder == "isobmff" &&
      (routed(1L).width, routed(1L).height) == (640, 360))
    assert(routed(2L).decoder == "stub")
  }

  test("EBML walk decodes Matroska/WebM headers into video features") {
    implicit val s = spark
    import spark.implicits._
    // independent EBML writer, straight off RFC 8794: ids are
    // emitted as their tagged bytes, sizes as minimal-length VINTs
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      (n - 1 to 0 by -1).map(i => ((id >> (8 * i)) & 0xff).toByte).toArray
    }
    def sizeVint(v: Long, len: Int): Array[Byte] = {
      val marked = v | (1L << (7 * len))
      (len - 1 to 0 by -1).map(i => ((marked >> (8 * i)) & 0xff).toByte)
        .toArray
    }
    def el(id: Long, body: Array[Byte], sizeLen: Int = 1): Array[Byte] =
      idBytes(id) ++ sizeVint(body.length, sizeLen) ++ body
    def uintBody(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    }
    def f64(v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (7 to 0 by -1).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
    }
    def f32(v: Float): Array[Byte] = {
      val bits = java.lang.Float.floatToIntBits(v)
      (3 to 0 by -1).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
    }
    val ebmlHead = el(0x1A45DFA3L, el(0x4282L, "webm".getBytes("US-ASCII")))
    def video(w: Int, h: Int): Array[Byte] =
      el(0xE0L, el(0xB0L, uintBody(w)) ++ el(0xBAL, uintBody(h)))
    def audioTrack: Array[Byte] = // TrackEntry with an Audio child only
      el(0xAEL, el(0xE1L, el(0xB5L, f64(48000.0))))
    def info(scale: Option[Long], dur: Option[Array[Byte]]): Array[Byte] =
      el(0x1549A966L,
        scale.map(sc => el(0x2AD7B1L, uintBody(sc))).getOrElse(Array.empty) ++
          dur.map(d => el(0x4489L, d)).getOrElse(Array.empty))
    // webm-shaped: Info (scale 1e6, f64 duration in ticks) + an audio
    // track FIRST (the walk must skip to the video TrackEntry);
    // 2-byte size VINT on the Segment exercises multi-byte lengths
    val seg1 = el(0x18538067L,
      info(Some(1000000L), Some(f64(12345.0))) ++
        el(0x1654AE6BL, audioTrack ++ el(0xAEL, video(640, 360))),
      sizeLen = 2)
    val mkv1 = ebmlHead ++ seg1
    // UNKNOWN-size Segment (all-ones VINT, streamed/live shape) +
    // f32 duration + non-default timecode scale
    val seg2body = info(Some(2000000L), Some(f32(500.0f))) ++
      el(0x1654AE6BL, el(0xAEL, video(1920, 1080)))
    val mkv2 = ebmlHead ++ idBytes(0x18538067L) ++
      Array(0xFF.toByte) ++ seg2body
    // no Duration declared -> -1; default TimecodeScale (Info absent)
    val mkv3 = ebmlHead ++ el(0x18538067L,
      el(0x1654AE6BL, el(0xAEL, video(320, 240))))
    // audio-only Segment: EBML but no video track -> not a video hit
    val mkvAudio = ebmlHead ++ el(0x18538067L,
      info(None, Some(f64(8.0))) ++ el(0x1654AE6BL, audioTrack))
    val payloads = Seq(
      (1L, mkv1), (2L, mkv2), (3L, mkv3), (4L, mkvAudio),
      (5L, mkv1.take(ebmlHead.length + 6)), // truncated mid-Segment
      (6L, "not an ebml stream at all".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeVideo(payloads).collect()
      .map(r => r.doc_id -> r).toMap
    assert(m(1L).ok && m(1L).decoder == "ebml")
    assert((m(1L).width, m(1L).height) == (640, 360))
    assert(math.abs(m(1L).duration_sec - 12.345) < 1e-9) // 12345·1e6/1e9
    assert(m(2L).ok && m(2L).decoder == "ebml")
    assert((m(2L).width, m(2L).height) == (1920, 1080))
    assert(math.abs(m(2L).duration_sec - 1.0) < 1e-9) // 500·2e6/1e9
    assert(m(3L).ok && (m(3L).width, m(3L).height) == (320, 240))
    assert(m(3L).duration_sec == -1.0)
    assert(!m(4L).ok && m(4L).decoder == "none")
    assert(!m(5L).ok && m(5L).decoder == "none")
    assert(!m(6L).ok && m(6L).decoder == "none")
  }

  test("multimodal decode plumbing preserves rows and is deterministic") {
    implicit val s = spark
    val decoded = Multimodal.decode(Multimodal.asPayload(t.documents))
    val rows = decoded.collect()
    assert(rows.length == t.documents.count())
    assert(rows.forall(_.ok))
    assert(rows.forall(r => r.width >= 16 && r.height >= 16))
    val again = Multimodal.decode(Multimodal.asPayload(t.documents)).collect()
    assert(rows.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
  }

  /** The edge-case frame the matrix-bound plane expressions (r8) are
    * pinned on: normal vectors, all-negative, all-zero (dot == +0.0,
    * bit SET), a null vector, a length mismatch, a null element, and
    * a NaN element (Spark's `>=` ranks NaN above every real, so its
    * bit is SET — the fused form must agree). */
  private def planeEdgeCases = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("e", ArrayType(FloatType, containsNull = true))))
    def fa(xs: Float*): Seq[java.lang.Float] =
      xs.map(java.lang.Float.valueOf)
    val rows = Seq(
      Row(0, fa(1f, -2f, 3f, 0.5f)),
      Row(1, fa(-1f, -1f, -1f, -1f)),
      Row(2, fa(0f, 0f, 0f, 0f)),
      Row(3, null),
      Row(4, fa(1f, 2f)),
      Row(5, Seq[java.lang.Float](1f, null, 2f, 3f)),
      Row(6, fa(Float.NaN, 1f, 1f, 1f)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("sign_bands == the literal-per-plane declarative banding") {
    val df = planeEdgeCases
    val planes = Similarity.hyperplanes(4, 6, seed = 7L)
    val bitsPerBand = 3
    val bands = planes.size / bitsPerBand
    val decl = df.select(col("id"), explode(array((0 until bands).map { bi =>
        struct(lit(bi).as("band"),
          Similarity.bucketBitsDeclarative(col("e"),
            planes.slice(bi * bitsPerBand, (bi + 1) * bitsPerBand))
            .as("bits"))
      }: _*)).as("b"))
      .select(col("id"), col("b.band"), col("b.bits")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val fused = df.select(col("id"),
        posexplode(graft.plans.PlaneExpressions
          .signBands(col("e"), planes, bitsPerBand))
          .as(Seq("band", "bits"))).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(decl.nonEmpty && fused == decl)
    // the single-bucket form too (bucketBits == its declarative twin)
    val b1 = df.select(col("id"),
        Similarity.bucketBits(col("e"), planes).as("b")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b2 = df.select(col("id"),
        Similarity.bucketBitsDeclarative(col("e"), planes).as("b")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    // the NaN row has its first-plane bits set in SOME band (sanity
    // that the edge case actually exercises the NaN branch)
    assert(b1.contains(6))
  }

  test("plane_dots == array(dotConst(..)) element-for-element") {
    val df = planeEdgeCases
    val planes = Similarity.hyperplanes(4, 5, seed = 11L)
    def bits(v: Any): Any = v match {
      case null => null
      case d: Double => java.lang.Double.doubleToLongBits(d)
    }
    val decl = df.select(col("id"),
        array(planes.map(p => VectorFns.dotConst(col("e"), p)): _*).as("d"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Any](1).map(bits)).toMap
    val fused = df.select(col("id"),
        graft.plans.PlaneExpressions.planeDots(col("e"), planes).as("d"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Any](1).map(bits)).toMap
    assert(decl.nonEmpty && fused == decl)
    // null vector → all-null dots, not a null array (array() semantics)
    assert(fused(3).forall(_ == null) && fused(3).size == planes.size)
  }

  test("plane coefficients appear ONCE per plan: never as literals") {
    val emb = t.embeddings
    // the wide Gaussian rung the fix protects: 80 planes × 64 dims
    val (planes, bits) = (Similarity.hyperplanes(64, 80), 20)
    val coeffs = planes.flatten.map(_.toString.take(12))
    val idx = Similarity.signBandIndex(emb, planes, bits)
    val idxPlan = idx.queryExecution.executedPlan.toString
    assert(idxPlan.contains("sign_bands"))
    assert(coeffs.forall(c => !idxPlan.contains(c)),
      "a plane coefficient leaked into the sign-band plan as a literal")
    idx.unpersist()
    // multi-probe: margins + base bucket + corpus bucket in one plan
    val mp = Similarity.annLshMultiProbe(emb, emb.where(col("vec_id") < 4),
      Similarity.hyperplanes(64, 6), k = 3, probes = 3)
    val mpPlan = mp.queryExecution.executedPlan.toString
    val mpCoeffs = Similarity.hyperplanes(64, 6).flatten.map(_.toString.take(12))
    assert(mpPlan.contains("plane_dots") && mpPlan.contains("sign_bands"))
    assert(mpCoeffs.forall(c => !mpPlan.contains(c)),
      "a plane coefficient leaked into the multi-probe plan as a literal")
  }
}
