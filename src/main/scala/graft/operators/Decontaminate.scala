package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: per-training-document n-gram overlap
  * against a held-out benchmark corpus — the standard pre-training
  * hygiene pass (report the fraction of a doc's shingles that appear
  * anywhere in the benchmark; drop or flag docs above a threshold).
  *
  * Not a reference operator: part of the LLM-training-data surface
  * this engine adds beyond the reference's ETL scope.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the TRAIN side is one scan → shingle explode → distinct — the
  *    same inverted-index pass `Dedup.jaccardPairs` does, map-side
  *    until the distinct;
  *  - the BENCH side is small *by construction* (benchmarks are
  *    MB-scale against a 100 TB corpus), so its distinct shingle set
  *    is `broadcast()` — the candidate match is a broadcast hash
  *    join, never a shuffle of the training corpus by shingle;
  *  - the per-doc rollup shuffles one (id, hit) row per distinct
  *    train shingle with map-side partial counts — the only shuffle
  *    in the plan, keyed by doc id.
  *
  * Shingles travel as 64-bit hashes (`plans.HashedShingles`, the
  * same fused codegen loop and the same argument as
  * `Dedup.jaccardPairs`): 8-byte join/distinct keys instead of
  * n-token strings (~14× less shuffle on tag-heavy corpora), and a
  * cross-corpus collision (~|train|·|bench|/2⁶⁴ — vanishing,
  * deterministic per corpus, so the oracle gate stays exact) only
  * *adds* a false match — for decontamination that errs toward
  * dropping more, the safe direction.
  */
object Decontaminate {

  /** Distinct hashed-shingle frame `(id, shingle: long)` — the
    * jaccardPairs index shape. */
  private def hashedShingleSet(df: DataFrame, id: Column, text: Column,
                               n: Int): DataFrame =
    df.select(id.as("id"),
        split(graft.io.Cleanser.normalized(text), " ").as("__w"))
      .where(size(col("__w")) >= n)
      .select(col("id"),
        explode(graft.plans.HashExpressions.hashedShingles(col("__w"), n))
          .as("shingle"))
      .distinct()

  /** Per-train-doc overlap stats: `(id, n_shingles, n_matched,
    * overlap_frac, contaminated)`. Docs with fewer than `n` tokens
    * have no shingles and are absent from the output (consistent
    * with `Dedup.shingles`). `overlap_frac` is an exact IEEE division
    * of two counts; `contaminated` = overlap_frac >= threshold as
    * 0/1 int.
    */
  def overlapStats(train: DataFrame, bench: DataFrame,
                   id: Column, text: Column, n: Int,
                   threshold: Double): DataFrame = {
    require(n >= 1, "shingle size must be >= 1")
    val benchSet = hashedShingleSet(bench, id, text, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1))
    val frac = col("n_matched").cast("double") /
      col("n_shingles").cast("double")
    hashedShingleSet(train, id, text, n)
      .join(broadcast(benchSet), Seq("shingle"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_matched"))
      .select(col("id"), col("n_shingles"), col("n_matched"),
        frac.as("overlap_frac"),
        (frac >= threshold).cast("int").as("contaminated"))
  }
}
