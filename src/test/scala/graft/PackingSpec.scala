package graft

import org.apache.spark.sql.functions._

import graft.etl.Batching

class PackingSpec extends GraftSuite {
  import spark.implicits._

  private def brute(weights: Seq[(Long, Option[Long])],
                    budget: Long): Map[Long, Long] = {
    var cum = 0L
    weights.sortBy(_._1).map { case (id, w) =>
      val pack = cum / budget
      cum += w.getOrElse(0L)
      id -> pack
    }.toMap
  }

  test("packByWeight matches the sequential cumulative-chunk semantics") {
    val rows: Seq[(Long, Option[Long])] =
      Seq(0L -> Some(10L), 1L -> Some(90L), 2L -> Some(5L), 3L -> None,
        4L -> Some(100L), 5L -> Some(1L), 6L -> Some(300L), 7L -> Some(99L))
    val df = rows.toDF("id", "w")
    val out = Batching.packByWeight(df, col("id"), col("w"),
        budget = 100L, partitions = 3)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out == brute(rows, 100L))
  }

  test("deterministicShuffle: a reproducible permutation, window-replay equal") {
    val df = spark.range(1000).toDF("id")
    def ranks(salt: String, parts: Int) =
      Batching.deterministicShuffle(df, col("id"), salt, parts)
        .select("id", "shuffle_rank").as[(Long, Long)].collect().toMap
    val a = ranks("e0", 7)
    // a dense permutation 0..n-1
    assert(a.values.toSeq.sorted == (0L until 1000L))
    // reproducible and partition-count independent
    assert(a == ranks("e0", 3))
    // equal to the single-window replay the operator replaces
    val replay = df.select(col("id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(md5(concat_ws("|", lit("e0"), col("id").cast("string")))))
          - 1).cast("long").as("r"))
      .as[(Long, Long)].collect().toMap
    assert(a == replay)
    // a new epoch salt is a genuinely different permutation
    assert(ranks("e1", 7) != a)
  }

  test("splitByRank: exact slice sizes, deterministic, ceil boundaries") {
    val df = spark.range(1000).toDF("id")
    def split(salt: String) =
      Batching.splitByRank(df, col("id"), salt,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), partitions = 5)
        .select("id", "split").as[(Long, String)].collect().toMap
    val a = split("f0")
    // exact counts, not expected counts
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map("train" -> 800, "val" -> 100, "test" -> 100))
    assert(a == split("f0")) // same salt, same split
    assert(split("f1") != a) // new salt, new fold
    // non-divisible n: boundaries are ceil(n*c) — 7 docs at 50/50
    // cut at ceil(3.5)=4
    val b = Batching.splitByRank(spark.range(7).toDF("id"), col("id"),
        "s", Seq("a" -> 0.5, "b" -> 0.5), partitions = 2)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(b == Map("a" -> 4L, "b" -> 3L))
  }

  test("pack assignment is independent of the partition count") {
    val df = spark.range(500).toDF("id")
      .withColumn("w", (col("id") % 37) + 1)
    def run(p: Int) = Batching.packByWeight(df, col("id"), col("w"),
        budget = 256L, partitions = p)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    val one = run(1)
    assert(run(7) == one && run(16) == one)
    // packs are contiguous and start at 0
    val packs = one.toSeq.sortBy(_._1).map(_._2)
    assert(packs.head == 0L && packs.zip(packs.tail).forall {
      case (a, b) => b == a || b == a + 1
    })
  }
}
