package graft.operators

import graft.schema.{Catalog, TableDef}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Write-path operators (SURVEY §2.1 S5-S8) as pure
  * DataFrame→DataFrame merges — the reference's mutable-record CRUD
  * (`model.php:667-885`) re-expressed for immutable columnar storage:
  * the caller rewrites the result (or feeds it to a MERGE-capable
  * table format); nothing here mutates files in place.
  *
  * Scale notes: every merge is a single equi-join on the primary key
  * — shuffle-partitioned by pk, AQE-skew-safe. The delta side of
  * update/upsert is normally tiny relative to base, so Catalyst
  * broadcasts it; nothing ever collects to the driver.
  */
object Writes {

  /** S5 — INSERT with auto-id assignment (`model.php:667-706`).
    * New ids are `max(existing) + rank(orderWithin)` — deterministic,
    * unlike `monotonically_increasing_id`, and gap-free within a batch
    * (documented non-gapless across retries, SURVEY §7).
    *
    * The global rank is computed WITHOUT a single-task global sort
    * (which would serialize a 100x-scale backfill batch): range-
    * partition on `orderWithin`, rank locally per partition, then add
    * each partition's row-count prefix sum. The offsets frame is one
    * row per partition — the prefix-sum window and the broadcast are
    * O(partitions), never O(rows). `orderWithin` must be a total order
    * of the batch (e.g. its natural key) for ids to be deterministic
    * under any partitioning. */
  def insert(base: DataFrame, rows: DataFrame, autoCol: String,
             orderWithin: Seq[Column]): DataFrame = {
    val maxId = base.agg(F.coalesce(F.max(F.col(autoCol)), F.lit(0L)).as("mx"))
    val parts = math.max(rows.sparkSession.sparkContext.defaultParallelism, 1)
    // checkpointed: `local` feeds BOTH the numbered rows and the
    // offsets frame. Without the pin, correctness would hinge on Spark
    // deduplicating the two identical range exchanges
    // (spark.sql.exchange.reuse) — if the subtrees were planned
    // independently, RangePartitioner's sampled boundaries could
    // differ per side and per-pid counts would no longer match the
    // pids rows actually landed in (duplicate/skipped ids).
    // localCheckpoint(eager) rather than persist(): both pin the
    // computed partitions, but a persist'ed plan stays in the
    // CacheManager until an explicit unpersist (which no lazy-result
    // API can ever safely call), while a checkpointed RDD is cleaned
    // by the ContextCleaner once unreferenced. Eager execution also
    // matches the reference: its create() runs the INSERT immediately
    // (`model.php:734`).
    val local = rows
      .repartitionByRange(parts, orderWithin: _*)
      .withColumn("__pid", F.spark_partition_id())
      .withColumn("__lrn", F.row_number().over(
        Window.partitionBy("__pid").orderBy(orderWithin: _*)).cast("long"))
      .localCheckpoint(eager = true)
    val offsets = local.groupBy("__pid").agg(F.count(F.lit(1)).as("__cnt"))
      .withColumn("__off", F.coalesce(F.sum("__cnt").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0L)))
      .select("__pid", "__off")
    val numbered = local
      .join(F.broadcast(offsets), "__pid")
      .crossJoin(F.broadcast(maxId))
      .withColumn(autoCol, F.col("mx") + F.col("__off") + F.col("__lrn"))
      .drop("__pid", "__lrn", "__off", "mx")
      .select(base.columns.toIndexedSeq.map(F.col): _*) // align column order
    base.unionByName(numbered)
  }

  /** S6 — delta UPDATE (`model.php:775-811`, `query_update`
    * `model.php:1185-1220`): `delta` carries the primary key plus ONLY
    * the changed columns (the reference's `$__changed` set); unchanged
    * columns never travel. Left-join merge: delta value wins when
    * present.
    *
    * No-op elision (`model.php:789-793`): an empty delta schema
    * (nothing but pk) returns base unchanged without a join. */
  def update(base: DataFrame, delta: DataFrame, pk: Seq[String],
             limit: Option[Int] = None): DataFrame = {
    val changedCols = delta.columns.filterNot(pk.contains)
    if (changedCols.isEmpty) return base // no-op elision
    val limited = applyLimit(delta, pk, limit)
    val d = limited.select((pk ++ changedCols).map(c =>
      limited(c).alias(if (pk.contains(c)) c else s"__d_$c")): _*)
    val joined = base.join(d, pk, "left")
    val merged = base.columns.foldLeft(joined) { (df, c) =>
      if (changedCols.contains(c))
        df.withColumn(c, F.coalesce(F.col(s"__d_$c"), F.col(c)))
      else df
    }
    merged.select(base.columns.toIndexedSeq.map(F.col): _*)
  }

  /** S7 — DELETE (`model.php:831-853`): anti-join on the victim key
    * set. `victims` needs only the pk columns. */
  def delete(base: DataFrame, victims: DataFrame, pk: Seq[String],
             limit: Option[Int] = None): DataFrame =
    base.join(applyLimit(victims, pk, limit).select(pk.map(F.col): _*),
      pk, "left_anti")

  /** The reference's `LIMIT n` DML clause (`model.php:775,831`,
    * compiled at `model.php:1213-1217,1248-1252`, default `$limit = 1`):
    * restrict a delta/victim set to its first `n` rows by primary key.
    * SQL LIMIT-without-ORDER is nondeterministic; SURVEY §7 pins the
    * sane table-at-a-time semantics — sort by pk, then limit. The
    * limited set is always tiny (TakeOrderedAndProject, no global
    * sort materialization), so downstream merges broadcast it. */
  private def applyLimit(df: DataFrame, pk: Seq[String],
                         limit: Option[Int]): DataFrame =
    limit.fold(df)(n => df.orderBy(pk.map(F.col(_).asc): _*).limit(n))

  /** S8 — UPSERT (`save()`, `model.php:873-885`): full-schema `rows`
    * replace matching pk rows and append the rest. Row-wise:
    * new-row wins; base rows without a match pass through. */
  def upsert(base: DataFrame, rows: DataFrame, pk: Seq[String]): DataFrame =
    base.join(rows.select(pk.map(F.col): _*), pk, "left_anti")
      .unionByName(rows.select(base.columns.toIndexedSeq.map(F.col): _*))

  /** Auto-now column stamping (`field/timestamp.php:16-21`,
    * `model.php:672-679,780-787`): set each auto_now_create /
    * auto_now_update field to `now` on the way through the write path.
    * `now` is injected (not `current_timestamp()`) so writes are
    * deterministic and replayable. */
  def stampAutoNow(t: TableDef, rows: DataFrame, now: Column,
                   creating: Boolean): DataFrame =
    t.fields.filter(f => if (creating) f.autoNowCreate else f.autoNowUpdate)
      .foldLeft(rows)((df, f) => df.withColumn(f.name, now))

  /** Cell-write transform hooks (`field.php:44-46`): apply each
    * field's on_change expression to incoming rows. */
  def applyOnChange(t: TableDef, rows: DataFrame): DataFrame =
    t.fields.filter(_.onChange.isDefined).foldLeft(rows)((df, f) =>
      df.withColumn(f.name, f.onChange.get(F.col(f.name))))

  /** CDC apply (the log-structured MERGE shape [[upsert]] cannot
    * express): fold a change batch of (op ∈ I/U/D, version) rows into
    * a base snapshot. Per key, the HIGHEST-version change wins
    * (last-writer-wins; ties broken by op descending so the outcome
    * is deterministic even on a degenerate feed): a winning I/U
    * replaces (or inserts) the row, a winning D removes it, and keys
    * the batch never touches pass through untouched.
    *
    * Scale shape: the window pass that picks each key's winner runs
    * over the CHANGE BATCH only (batches are small relative to the
    * snapshot); the snapshot's only work is one anti-join against the
    * winner key set — broadcast when the batch fits, so at 100 TB the
    * snapshot is filtered map-side and never shuffled. `changes` must
    * carry `base`'s columns plus `opCol`/`verCol`. */
  def cdcApply(base: DataFrame, changes: DataFrame, pk: Seq[String],
               opCol: String, verCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pk.map(F.col): _*)
      .orderBy(F.col(verCol).desc, F.col(opCol).desc)
    val latest = changes
      .withColumn("__rn", F.row_number().over(w))
      .filter(F.col("__rn") === 1)
    base.join(F.broadcast(latest.select(pk.map(F.col): _*)), pk, "left_anti")
      .unionByName(latest.filter(F.col(opCol) =!= "D")
        .select(base.columns.toIndexedSeq.map(F.col): _*))
  }
}
