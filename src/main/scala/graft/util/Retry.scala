package graft.util

import scala.util.{Failure, Success, Try}

/** Retry policies with exponential backoff and the reference's
  * batch→singleton degradation (code/ukg_open_census.py:430-474:
  * `get_staffing_descriptors` re-posts a failed batch as size-1
  * batches and accumulates per-item errors instead of failing the
  * run).
  *
  * Driver-side utility by design: it wraps external *API* calls (the
  * reference posts staffing batches to an HTTP endpoint), not row
  * processing — data-plane work belongs in executors, but the posting
  * loop over a few hundred pre-aggregated batches is genuinely a
  * driver concern.
  */
object Retry {

  final case class Policy(maxAttempts: Int = 3,
                          initialBackoffMs: Long = 0L,
                          backoffFactor: Double = 2.0) {
    require(maxAttempts >= 1, "need at least one attempt")
    def backoffFor(attempt: Int): Long =
      (initialBackoffMs * math.pow(backoffFactor, (attempt - 1).toDouble)).toLong
  }

  /** Run `f` up to `policy.maxAttempts` times with backoff between
    * attempts. Returns the first success, or all accumulated errors. */
  def withRetry[T](policy: Policy)(f: => T): Either[List[Throwable], T] = {
    var errors = List.empty[Throwable]
    var attempt = 1
    while (attempt <= policy.maxAttempts) {
      Try(f) match {
        case Success(v) => return Right(v)
        case Failure(e) =>
          errors = e :: errors
          val sleep = policy.backoffFor(attempt)
          if (sleep > 0 && attempt < policy.maxAttempts) Thread.sleep(sleep)
          attempt += 1
      }
    }
    Left(errors.reverse)
  }

  /** Outcome of a degraded batch posting run: which batches went
    * through whole, which items succeeded after their batch was split
    * to singletons, and the per-item errors for the rest. */
  final case class BatchOutcome[A](wholeBatches: Int,
                                   salvagedItems: Vector[A],
                                   failedItems: Vector[(A, Throwable)]) {
    def allErrors: Vector[Throwable] = failedItems.map(_._2)
    def fullySucceeded: Boolean = failedItems.isEmpty
  }

  /** Post each batch via `post`; a batch that still fails after
    * `policy` retries degrades to singleton posts (each itself
    * retried), accumulating per-item errors — the reference's exact
    * recovery ladder (batch → singletons → error list), minus the
    * `collect()`-everything it builds batches from.
    */
  def postWithDegradation[A](batches: Seq[Seq[A]], policy: Policy = Policy())
                            (post: Seq[A] => Unit): BatchOutcome[A] = {
    var whole = 0
    val salvaged = Vector.newBuilder[A]
    val failed = Vector.newBuilder[(A, Throwable)]
    batches.foreach { batch =>
      withRetry(policy)(post(batch)) match {
        case Right(_) => whole += 1
        case Left(_) =>
          batch.foreach { item =>
            withRetry(policy)(post(Seq(item))) match {
              case Right(_) => salvaged += item
              case Left(errs) => failed += (item -> errs.last)
            }
          }
      }
    }
    BatchOutcome(whole, salvaged.result(), failed.result())
  }
}
