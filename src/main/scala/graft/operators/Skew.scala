package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Salted two-stage aggregation (the join-side skew twin is
  * [[Joins.saltedJoin]]). On a balanced fixture this produces results
  * identical to the plain `groupBy` (which is exactly what the oracle
  * checks); its value is the SHAPE of the physical plan — no single
  * reducer ever owns a hot key.
  *
  * Scale design: a plain `groupBy(key)` on a zipfian corpus sends
  * every row of the hottest key to one task; at 100 TB that task is
  * the job. [[saltedAgg]] splits each key into `buckets` sub-keys
  * derived from an unrelated column, aggregates the sub-keys
  * (parallelism `keys × buckets`), then merges the per-bucket
  * partials — both stages are map-side combinable, and the merge
  * shuffle carries one row per (key, bucket).
  *
  * Only aggregates that commute with the two-stage split are exposed
  * (count / sum / min / max) — an avg must be rebuilt as sum/count by
  * the caller, never averaged per bucket.
  *
  * ==When AQE suffices, and when salting still wins==
  * AQE's `OptimizeSkewedJoin` is the zero-code-change alternative for
  * BATCH JOINS: it splits an oversized shuffle partition into
  * per-mapper chunks at runtime and duplicates the other side —
  * SkewSpec pins that it fires (skew=true) and returns identical
  * results on the same hot-key join. Prefer it there. Manual salting
  * remains the only fix where AQE cannot re-plan:
  *  - skewed AGGREGATIONS — OptimizeSkewedJoin only rewrites joins; a
  *    hot `groupBy` key still lands on one reducer under AQE, which
  *    is exactly [[saltedAgg]]'s case;
  *  - STREAMING / stateful joins and aggregations — micro-batch plans
  *    pin state to a fixed partitioning across batches, so no runtime
  *    re-split is possible (state row ↔ partition assignment must be
  *    stable);
  *  - shuffles fed by FEW MAPPERS — AQE splits by reassembling
  *    per-mapper output, so a hot key produced by one mapper (one
  *    giant input file) is unsplittable no matter how skewed;
  *  - full-sort / deterministic-layout requirements, where the
  *    runtime re-plan would break a downstream contract on the
  *    exchange.
  */
object Skew {

  /** Per-key count/sum/min/max computed through a salted two-stage
    * aggregation. `saltFrom` must be a column that varies within a
    * key (a row id, an event id) — the salt is `saltFrom % buckets`,
    * deterministic and engine-portable. */
  def saltedAgg(df: DataFrame, keyCol: String, saltFrom: Column,
                valCol: String, buckets: Int = 16): DataFrame = {
    require(!df.columns.contains("__salt"),
      "saltedAgg reserves the intermediate column name '__salt'")
    // coalesce: NULL saltFrom values still aggregate (into bucket 0) —
    // keeps bucket assignment total, and matches saltedJoin's handling
    val partial = df
      .withColumn("__salt", F.coalesce(F.pmod(saltFrom, F.lit(buckets)), F.lit(0)))
      .groupBy(F.col(keyCol), F.col("__salt"))
      .agg(F.count(F.lit(1)).as("__n"),
        F.sum(F.col(valCol)).as("__s"),
        F.min(F.col(valCol)).as("__mn"),
        F.max(F.col(valCol)).as("__mx"))
    partial.groupBy(keyCol)
      .agg(F.sum("__n").as("n_rows"),
        F.sum("__s").as("sum_value"),
        F.min("__mn").as("min_value"),
        F.max("__mx").as("max_value"))
  }

}
