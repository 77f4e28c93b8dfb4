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
