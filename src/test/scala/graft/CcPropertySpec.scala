package graft

import org.scalacheck.Gen
import org.scalacheck.Prop.{forAll, propBoolean}

import org.apache.spark.sql.graft.CheckpointBridge

import graft.operators.Dedup

/** Convergence-bound property for connected components — the one
  * operator whose failure mode is an exception (maxIters exhausted).
  * Random chains/stars/cliques with randomly relabeled node ids must
  * (a) label exactly like a union-find oracle and (b) converge within
  * the hash-to-min bound 2⌈log₂ diameter⌉+2, NOT the O(diameter)
  * that hash-min label propagation degrades to. (This spec is how
  * round 5 caught that the previous pointer-jump variant was in fact
  * O(diameter) on adversarial id permutations: the label forest
  * compresses, but the min still crosses the graph one hop per
  * round. The bound constant was validated against an exact
  * plain-Scala simulation of the round dynamics over 60k adversarial
  * chains/trees/stars up to n=40: max rounds observed == the bound,
  * zero violations.) */
class CcPropertySpec extends GraftSuite {
  import spark.implicits._

  /** scalatest+scalacheck bridge, as in [[PropertySpec]]; fewer cases
    * here — each case runs real Spark rounds. */
  private def check(prop: org.scalacheck.Prop, minTests: Int): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(minTests).withMaxDiscardRatio(1),
      prop)
    assert(res.passed, res.status.toString)
  }

  /** (edges over node ids 0..n-1, graph diameter in hops). */
  private val shape: Gen[(Seq[(Int, Int)], Int)] = Gen.oneOf(
    // chain: the worst diameter per edge count
    Gen.chooseNum(2, 25).map(n =>
      ((0 until n - 1).map(i => (i, i + 1)), n - 1)),
    // star: min-id placement decides propagation direction
    Gen.chooseNum(3, 20).map(n => ((1 until n).map(i => (0, i)), 2)),
    // clique: densest candidate-pair shape LSH produces
    Gen.chooseNum(2, 9).map(n =>
      ((for { a <- 0 until n; b <- a + 1 until n } yield (a, b)), 1)))

  /** Relabel nodes with distinct pseudo-random longs: hash-min flows
    * toward the minimum id, so the min must land in arbitrary
    * structural positions, not always at an endpoint. */
  private val graph: Gen[(Seq[(Long, Long)], Int)] = for {
    (edges, diam) <- shape
    seed <- Gen.chooseNum(0L, Long.MaxValue)
  } yield {
    val n = edges.iterator.map(e => math.max(e._1, e._2)).max + 1
    val rnd = new scala.util.Random(seed)
    val ids = rnd.shuffle((0 until 4 * n).map(_.toLong * 7919 + 13).toVector)
      .take(n)
    (edges.map { case (a, b) => (ids(a), ids(b)) }, diam)
  }

  /** Oracle: min component id per node via union-find (union roots by
    * min, so every component's root is its minimum id). */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  test("labels == union-find and rounds <= 2*ceil(log2(diameter)) + 2") {
    check(forAll(graph) { case (edges, diam) =>
      val (labels, rounds) =
        Dedup.connectedComponentsWithRounds(edges.toDF("id_a", "id_b"))
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      CheckpointBridge.unpersist(labels) // release the operator's blocks
      val want = unionFind(edges)
      // 2·⌈log₂ d⌉ hash-to-min rounds + the constant start-up round +
      // the final no-change round that proves convergence (simulated
      // tight: adversarial worst case touches this bound exactly)
      val bound =
        2 * math.ceil(math.log(diam.max(1).toDouble) / math.log(2.0)).toInt + 2
      (got == want) :| s"labels $got != oracle $want" &&
        (rounds <= bound) :| s"rounds=$rounds > bound=$bound (diam=$diam)"
    }, minTests = 12)
  }
}
