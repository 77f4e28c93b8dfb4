package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns as pure Column
  * expressions — per-row map-side work that never shuffles on its own.
  *
  * Every element is promoted to double *before* multiplying and the
  * sum is a strict left fold, which makes the result bit-exact and
  * reproducible across engines (the DuckDB oracle's
  * `list_cosine_similarity(CAST(... AS DOUBLE[]))` produces the
  * identical double — verified bitwise on the test corpus).
  *
  * For the 100 TB path these stay inside the executors as codegen'd
  * higher-order functions; the hot variant (a fused dot-product
  * Catalyst Expression with `doGenCode`) is a drop-in replacement for
  * `dot` if profiling demands it.
  */
object VectorFns {

  /** Left-fold dot product in double precision (fused codegen loop —
    * see graft.plans.DotProduct; `dotHof` is the declarative twin). */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vecDot(a, b)

  /** Declarative higher-order-function dot product — same result
    * bit-for-bit, ~50× slower per pair; kept as the spec reference
    * the custom expression is tested against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Dot product against a constant vector (e.g. an LSH hyperplane). */
  def dotConst(a: Column, v: Seq[Double]): Column =
    dot(a, array(v.map(lit): _*))

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; use `cosinePre` when norms are precomputed.
    * A zero-norm input yields NaN (double division — no ANSI error);
    * callers ranking by the result must filter zero-norm vectors
    * first, as the Similarity operators do, or NaN sorts above every
    * real score. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine from a precomputed norm pair — at scale norms are computed
    * once per side (one scan) instead of once per candidate pair. */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
