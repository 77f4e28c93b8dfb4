package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.{PartitionedStore, Tables}
import graft.operators.Similarity

/** The persisted IVF layout: centroids + assignments stored once,
  * probed and incrementally appended without recomputing the corpus
  * side — the IVF analog of the bucketed signature / sign-band
  * stores. */
class IvfStoreSpec extends GraftSuite {

  private val storeRoot = "/tmp/graft_ivf_store_spec"

  private def emb: DataFrame =
    Tables(spark, sfDir).embeddings
      .where(graft.functions.VectorFns.l2Norm(col("embedding")) > 0)

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq.sorted

  test("stored layout reproduces annIvfTopK bit-for-bit through a store roundtrip") {
    val path = s"$storeRoot/roundtrip"
    val queries = emb.where(col("vec_id") < 8)
    val direct = Similarity.annIvfTopK(emb, queries,
      numCentroids = 16, nProbe = 4, k = 5, lloydIters = 2)

    val cents = Similarity.ivfCentroids(emb, 16, lloydIters = 2)
    PartitionedStore.write(Similarity.ivfAssignments(emb, cents),
      path, "c_id")
    // centroids persist next to the assignments, as a deployment would
    cents.write.mode("overwrite").parquet(s"${path}__centroids")
    val stored = Similarity.annIvfTopKFromIndex(
      spark.read.parquet(s"${path}__centroids"),
      spark.read.parquet(path),
      queries, nProbe = 4, k = 5)
    assert(rows(stored) == rows(direct))
  }

  test("appended assignments equal a full recompute over the combined corpus") {
    val path = s"$storeRoot/incr"
    val ref = emb.where(col("vec_id") % 3 === 0)
    val batch = emb.where(col("vec_id") % 3 =!= 0)
    // the layout is trained on the reference corpus and FROZEN — the
    // daily batch assigns against the same centroids, which is what
    // makes append ≡ recompute (assignment is pointwise per vector)
    val cents = Similarity.ivfCentroids(ref, 16, lloydIters = 1)

    PartitionedStore.write(Similarity.ivfAssignments(ref, cents),
      path, "c_id")
    val tripped = PartitionedStore.appendAndMaintain(
      Similarity.ivfAssignments(batch, cents), path, "c_id",
      maxFragments = 4)
    assert(tripped.isEmpty, "one append must not trip compaction")

    val queries = emb.where(col("vec_id") < 8)
    val fromStore = Similarity.annIvfTopKFromIndex(cents,
      spark.read.parquet(path), queries, nProbe = 4, k = 5)
    val recomputed = Similarity.annIvfTopKFromIndex(cents,
      Similarity.ivfAssignments(ref.unionByName(batch), cents),
      queries, nProbe = 4, k = 5)
    assert(rows(fromStore).nonEmpty && rows(fromStore) == rows(recomputed))
  }

  test("probe scan READS only the probed partitions (measured, not plan-string)") {
    // the lesson encoded here: this test used to assert the plan
    // CONTAINS a dynamicpruning filter — which passed while the
    // filter silently degraded to `true` at runtime (its broadcast
    // is not reused for this plan shape under the default
    // reuseBroadcastOnly) and the scan read every partition. The
    // operator now pushes the probed cluster set as a static isin;
    // this asserts the MEASURED file count of the executed scan.
    val path = s"$storeRoot/dpp"
    val cents = Similarity.ivfCentroids(emb, 16, lloydIters = 0)
    PartitionedStore.write(Similarity.ivfAssignments(emb, cents),
      path, "c_id")
    val totalFiles = PartitionedStore
      .filesPerPartition(spark, path, "c_id").values.sum
    val probe = Similarity.annIvfTopKFromIndex(cents,
      spark.read.parquet(path), emb.where(col("vec_id") < 8),
      nProbe = 4, k = 5)
    probe.collect() // count() would execute a DERIVED plan — the
    // metrics below must come from THIS one
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leaves(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        leaves(r.child)
      case s if s.children.isEmpty => Seq(s) ++ s.subqueries.flatMap(leaves)
      case s => (s.children ++ s.subqueries).flatMap(leaves)
    }
    val storeScanFiles = leaves(probe.queryExecution.executedPlan)
      .filter(_.nodeName.contains("Scan parquet"))
      .flatMap(_.metrics.get("numFiles").map(_.value))
      .filter(_ > 0)
    // 8 queries × 4 probes < 16 clusters almost surely; the hard
    // bound is ≤ 32 of them — strictly fewer files than the store
    assert(storeScanFiles.exists(_ < totalFiles),
      s"no store scan read fewer than all $totalFiles files: $storeScanFiles")
    // and the probed set is what the plan filters on statically
    assert(probe.queryExecution.executedPlan.toString.contains("c_id"),
      "store scan lost its partition filter")
  }

  test("refresh warm-start identity: store(a iters) + b more == straight-through a+b") {
    // the k-means analog of QualityModel.trainRaw's warm-start spec:
    // refreshing a layout stored after `a` Lloyd iterations by `b`
    // more yields BIT-IDENTICAL centroids to ivfCentroids(corpus,
    // a+b) — exact equality, which only holds because the M-step
    // mean is an order-independent decimal sum (a double avg drifts
    // with partial-aggregation order between the two plans)
    val cents1 = Similarity.ivfCentroids(emb, 16, lloydIters = 1)
    val store = Similarity.ivfAssignments(emb, cents1)
    val refreshed = Similarity.ivfRefreshCentroids(store, lloydIters = 2)
    val straight = Similarity.ivfCentroids(emb, 16, lloydIters = 3)
    def centRows(df: DataFrame): Seq[(Long, Seq[Double], Double)] =
      df.collect().map(r => (r.getLong(0),
        r.getSeq[Double](1), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(centRows(refreshed).nonEmpty &&
      centRows(refreshed) == centRows(straight))
  }

  test("refresh maintains a REAL store: roundtrip rewrite probes like the fresh layout") {
    val path = s"$storeRoot/refresh"
    // day 1: train on the reference slice, store, freeze
    val ref = emb.where(col("vec_id") % 3 === 0)
    val batch = emb.where(col("vec_id") % 3 =!= 0)
    val cents = Similarity.ivfCentroids(ref, 16, lloydIters = 1)
    PartitionedStore.write(Similarity.ivfAssignments(ref, cents),
      path, "c_id")
    // day 2: frozen-centroid append (the daily path)
    PartitionedStore.appendAndMaintain(
      Similarity.ivfAssignments(batch, cents), path, "c_id")
    // scheduled maintenance: refresh centroids FROM THE STORE (it
    // carries every vector), re-assign, and write a SUCCESSOR
    // directory — VersionStore's discipline. Overwriting `path` in
    // place would delete the very files the refreshed layout's lazy
    // plan still reads (FAILED_READ_FILE mid-write — measured here
    // before this test took its current form); successor-and-swap is
    // also the only shape that leaves day-N readers isolated during
    // a corpus-sized rewrite.
    val stored = spark.read.parquet(path)
    val cents2 = Similarity.ivfRefreshCentroids(stored, lloydIters = 1)
    val vecs = stored.select(col("n_id").as("vec_id"),
      col("ec").as("embedding"))
    val next = s"$path.v2"
    PartitionedStore.write(Similarity.ivfAssignments(vecs, cents2),
      next, "c_id")
    cents2.write.mode("overwrite").parquet(s"${next}__centroids")
    // the refreshed store probes exactly like the in-memory refresh
    // of the same layout — maintenance is a cache, not a fork
    val queries = emb.where(col("vec_id") < 8)
    val fromStore = Similarity.annIvfTopKFromIndex(
      spark.read.parquet(s"${next}__centroids"),
      spark.read.parquet(next), queries, nProbe = 4, k = 5)
    val inMemory = Similarity.annIvfTopKFromIndex(cents2,
      Similarity.ivfAssignments(vecs, cents2), queries, nProbe = 4, k = 5)
    assert(rows(fromStore).nonEmpty && rows(fromStore) == rows(inMemory))
  }

  test("appends fragment boundedly; compaction rewrites only fragmented directories") {
    val path = s"$storeRoot/frag"
    val cents = Similarity.ivfCentroids(emb, 8, lloydIters = 0)
    val asg = Similarity.ivfAssignments(emb, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      PartitionedStore.write(asg, path, "c_id")
      val total = spark.read.parquet(path).count()
      // three daily appends of a slice touching only SOME clusters
      val slice = asg.where(pmod(col("n_id"), lit(4)) === 0)
      val sliceClusters = slice.select("c_id").distinct()
        .collect().map(_.getLong(0).toString).toSet
      val untouched = PartitionedStore
        .filesPerPartition(spark, path, "c_id")
        .keys.filterNot(sliceClusters).toSet
      (1 to 3).foreach { _ =>
        PartitionedStore.append(slice, path, "c_id")
      }
      val fpp = PartitionedStore.filesPerPartition(spark, path, "c_id")
      assert(fpp.values.max == 4,
        s"value-aligned appends must add one file per touched dir: $fpp")
      assert(untouched.forall(fpp(_) == 1),
        "append touched directories outside the batch's clusters")

      // compaction bound 2: only the appended (4-file) dirs rewrite
      val rewritten = PartitionedStore.compactIfFragmented(
        spark, path, "c_id", maxFragments = 2)
      assert(rewritten.nonEmpty &&
        rewritten.toSet.subsetOf(sliceClusters),
        s"compaction rewrote untouched dirs: $rewritten")
      val after = PartitionedStore.filesPerPartition(spark, path, "c_id")
      assert(after.values.max == 1, s"compaction left fragments: $after")
      // content intact: original + 3 appended slices
      val sliceRows = slice.count()
      assert(spark.read.parquet(path).count() == total + 3 * sliceRows)
      // idempotent below the bound
      assert(PartitionedStore.compactIfFragmented(
        spark, path, "c_id", maxFragments = 2).isEmpty)
    } finally asg.unpersist()
  }
}
