package graft

import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKBuffer
import graft.util.Retry

/** Property tests for the hand-rolled data structures — the places a
  * single off-by-one survives example tests. */
class PropertySpec extends AnyFunSuite {

  /** scalatest+scalacheck bridge (the scalatestplus artifact is not
    * in the offline cache): run the property, assert it passed. */
  private def check(prop: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200),
      prop)
    assert(res.passed, res.status.toString)
  }

  private val pair: Gen[(Double, Long)] = for {
    s <- Gen.oneOf(
      Gen.chooseNum(-1e9, 1e9),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, 0.0, -0.0))
    i <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
  } yield (s, i)

  /** NaN-safe equality: Scala `==` on boxed doubles follows IEEE
    * (NaN != NaN), so compare bit patterns. */
  private def bits(p: Seq[(Double, Long)]): Seq[(Long, Long)] =
    p.map { case (s, i) => (java.lang.Double.doubleToLongBits(s), i) }

  /** Reference semantics: total order (score DESC, id ASC) like
    * Spark's window sort — NaN above +Inf, -0.0 below 0.0. */
  private def refTopK(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith { case ((s1, i1), (s2, i2)) =>
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }.take(k)

  test("TopKBuffer.insert equals sort-take for any inputs incl NaN/±0") {
    check(forAll(Gen.listOf(pair), Gen.chooseNum(1, 8)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.insert(s, i) }
      bits(buf.sortedPairs.toSeq) == bits(refTopK(xs, k))
    })
  }

  test("TopKBuffer.merge equals sort-take over the concatenation") {
    check(forAll(Gen.listOf(pair), Gen.listOf(pair),
        Gen.chooseNum(1, 6)) { (xs, ys, k) =>
      val (a, b) = (new TopKBuffer(k), new TopKBuffer(k))
      xs.foreach { case (s, i) => a.insert(s, i) }
      ys.foreach { case (s, i) => b.insert(s, i) }
      a.mergeFrom(b)
      bits(a.sortedPairs.toSeq) == bits(refTopK(xs ++ ys, k))
    })
  }

  test("TopKBuffer serialization round-trips") {
    check(forAll(Gen.listOf(pair), Gen.chooseNum(1, 6)) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.insert(s, i) }
      bits(TopKBuffer.fromBytes(k, buf.toBytes).sortedPairs.toSeq) ==
        bits(buf.sortedPairs.toSeq)
    })
  }

  test("Sampling.hexThreshold is monotone and keep-sets nest by rate") {
    check(forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) {
      (r1, r2) =>
        val (lo, hi) = if (r1 <= r2) (r1, r2) else (r2, r1)
        // string compare == numeric compare at these widths, and a
        // lower rate's threshold never admits a key a higher rejects
        graft.operators.Sampling.hexThreshold(lo) <=
          graft.operators.Sampling.hexThreshold(hi)
    })
  }

  test("Retry.withRetry attempt count is exact for any policy") {
    check(forAll(Gen.chooseNum(1, 6), Gen.chooseNum(0, 10)) {
      (maxAttempts, failures) =>
        var calls = 0
        val r = Retry.withRetry(Retry.Policy(maxAttempts)) {
          calls += 1
          if (calls <= failures) sys.error(s"fail $calls") else calls
        }
        if (failures >= maxAttempts)
          r.isLeft && calls == maxAttempts &&
            r.left.exists(_.size == maxAttempts)
        else r == Right(failures + 1) && calls == failures + 1
    })
  }
}
