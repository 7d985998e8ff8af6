package graft.operators

import graft.schema._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

/** Relation joins (SURVEY §2.3) — the reference's relation algebra
  * (`classes/hive/relation/<kind>.php`) driven by the declared
  * `TableDef.relations`.
  *
  * Scale notes:
  *  - All reference joins are equi-joins along declared keys, so they
  *    shuffle-partition on the join key — co-location friendly.
  *  - Fixed-size dimension tables (region: 5 rows, nation: 25 rows —
  *    constant at every scale factor) are explicitly broadcast; for
  *    everything else Catalyst's size estimate + AQE picks
  *    broadcast-hash vs sort-merge, which is the right call when the
  *    "small" side grows with SF.
  */
object Joins {

  /** Dimension tables whose cardinality does not grow with data
    * scale — always broadcast-safe, even at 100 TB. */
  private val fixedSizeDims = Set("region", "nation")

  private def maybeBroadcast(name: String, df: DataFrame): DataFrame =
    if (fixedSizeDims(name)) F.broadcast(df) else df

  /** J1/J2/J3 — materialize `local` with its related `relName` rows
    * joined in (all declared columns of both sides; FK columns appear
    * once per side, as the reference keeps both, `model.php:272-283`).
    *
    * - BelongsTo / HasOne → 1:1 equi-join on `using` (J1)
    * - HasMany → 1:N equi-join (J2)
    * - ManyToMany → double equi-join through the pivot (J3)
    *
    * `example` is a QBE filter on the LOCAL side applied before the
    * join (the reference's parent-conditions merge,
    * `hasmany.php:29-44`) — it prunes the probe side early so the
    * filter is pushed below the shuffle.
    */
  def related(spark: SparkSession, sfDir: String, local: String, relName: String,
              example: Map[String, Any] = Map.empty): DataFrame = {
    val t = Catalog(local)
    val rel = t.relations.getOrElse(relName, throw new IllegalArgumentException(
      s"undeclared relation '$relName' on '$local'"))
    val localDf = Tables.scan(spark, sfDir, local).filter(Read.qbe(t, example))

    rel match {
      case r: HasOne =>
        // one deterministic child per parent: the reference reads the
        // first child row (LIMIT 1 under the child's declared sort,
        // hasone.php:13-36); table-at-a-time that is min-by-child-pk
        // per parent. min_by is a declarative aggregate, so it gets
        // map-side partial aggregation — each input partition reduces
        // to at most one candidate row per parent key BEFORE the
        // shuffle, where the row_number-window formulation would
        // shuffle + sort EVERY child row (wrong shape at fact scale).
        val remote = remoteWithConditions(spark, sfDir, r)
        val childPk = Catalog(r.model).primaryKeys.map(f => F.col(f.name))
        val parentKeys = r.using.map { case (_, rm) => rm }
        val first = remote
          .groupBy(parentKeys.map(F.col): _*)
          .agg(F.min_by(
            F.struct(remote.columns.toIndexedSeq.map(F.col): _*),
            F.struct(childPk: _*)).as("__first"))
          .select(F.col("__first.*"))
        val cond = r.using.map { case (l, rm) =>
          localDf(l) === first(rm)
        }.reduce(_ && _)
        localDf.join(maybeBroadcast(r.model, first), cond, "inner")

      case r @ (_: BelongsTo | _: HasMany) =>
        val remote = remoteWithConditions(spark, sfDir, r)
        val cond = r.using.map { case (l, rm) =>
          localDf(l) === remote(rm)
        }.reduce(_ && _)
        localDf.join(maybeBroadcast(r.model, remote), cond, "inner")

      case m: ManyToMany =>
        val pivot = Tables.scan(spark, sfDir, m.through)
        val remote = remoteWithConditions(spark, sfDir, m)
        val (lk, pk1) = m.localKey
        val (pk2, rk) = m.remoteKey
        // project the pivot to just its two key columns before the
        // join — column pruning keeps the shuffle payload minimal
        val pivotKeys = pivot.select(pk1, pk2)
        localDf
          .join(pivotKeys, localDf(lk) === pivotKeys(pk1), "inner")
          .join(maybeBroadcast(m.model, remote), pivotKeys(pk2) === remote(rk), "inner")
          .drop(pk1, pk2)
    }
  }

  /** J4 — many-to-many membership id list (`manytomany.php:20-54`):
    * only the remote-side ids related to the QBE-selected local rows,
    * deduplicated. Implemented as a semi-join-shaped pivot projection:
    * no remote table scan at all. */
  def relatedIds(spark: SparkSession, sfDir: String, local: String, relName: String,
                 example: Map[String, Any]): DataFrame = {
    val t = Catalog(local)
    val m = t.relations(relName) match {
      case m: ManyToMany => m
      case other => throw new IllegalArgumentException(
        s"relatedIds needs a many_to_many relation, got $other")
    }
    val (lk, pk1) = m.localKey
    val (pk2, _) = m.remoteKey
    val localIds = Tables.scan(spark, sfDir, local)
      .filter(Read.qbe(t, example)).select(lk)
    val pivot = Tables.scan(spark, sfDir, m.through).select(pk1, pk2)
    // local side after QBE is typically tiny (a point lookup) —
    // broadcast it so the pivot scan never shuffles
    pivot.join(F.broadcast(localIds), pivot(pk1) === localIds(lk), "left_semi")
      .select(pk2).distinct()
  }

  /** Bloom-filtered equi-join (scale utility): the manual form of
    * runtime row-level filtering — a Bloom filter over the dim side's
    * join keys is broadcast and applied to the FACT side as a
    * map-side filter BEFORE its shuffle, so a selective dim kills
    * most fact rows at the scan instead of shuffling them into a
    * sort-merge join. The pattern that matters exactly when the dim
    * side is selective but too large to broadcast-hash-join — at
    * 100 TB the fact shuffle is the job, and this removes most of it.
    *
    * Blooms have NO false negatives, so the result is identical to
    * the plain inner join (false positives just ride to the join and
    * lose there — PlanShapeSpec pins both the identity and the
    * filter-below-exchange plan shape). Spark's own
    * `runtime.bloomFilter` injection covers some of these plans
    * automatically; the explicit form works on any join and makes the
    * sizing (`fpp`, key count) a caller decision. The key-set count
    * and Bloom build are two eager passes over the DIM side only.
    * Long-typed keys (the fixture's FK shape).
    *
    * BROADCAST LIFETIME: the Bloom broadcast must stay alive as long
    * as the returned LAZY frame can re-execute, so this form cannot
    * destroy it — the ~`nKeys`·log2(1/fpp)-bit blob is pinned on the
    * driver (and each executor that ran a task) until the session
    * ends. For a long-lived session issuing many of these, use
    * [[withBloomFilteredJoin]], which scopes the broadcast to a
    * callback and destroys it on exit. */
  def bloomFilteredJoin(fact: DataFrame, factKey: String,
                        dim: DataFrame, dimKey: String,
                        fpp: Double = 0.01): DataFrame =
    buildBloomJoin(fact, factKey, dim, dimKey, fpp)._1

  /** Scoped [[bloomFilteredJoin]]: `use` must run every action it
    * needs on the joined frame; the Bloom broadcast is destroyed when
    * it returns, releasing the driver/executor memory immediately
    * instead of at session end. The frame must NOT escape `use` —
    * re-executing it after the destroy fails. */
  def withBloomFilteredJoin[T](fact: DataFrame, factKey: String,
                               dim: DataFrame, dimKey: String,
                               fpp: Double = 0.01)
                              (use: DataFrame => T): T = {
    val (joined, bc) = buildBloomJoin(fact, factKey, dim, dimKey, fpp)
    try use(joined) finally bc.destroy()
  }

  private def buildBloomJoin(fact: DataFrame, factKey: String,
                             dim: DataFrame, dimKey: String, fpp: Double)
      : (DataFrame,
         org.apache.spark.broadcast.Broadcast[
           org.apache.spark.util.sketch.BloomFilter]) = {
    val keys = dim.select(F.col(dimKey)).distinct().cache()
    val nKeys = math.max(keys.count(), 1L)
    val bloomBc = fact.sparkSession.sparkContext
      .broadcast(keys.stat.bloomFilter(dimKey, nKeys, fpp))
    keys.unpersist(false)
    // NATIVE codegen'd probe (graft.plans.BloomMightContain) — a
    // Scala UDF here would box every fact key and break the
    // whole-stage span the scan->filter spine sits in
    // two-sided qualified refs: F.col(factKey) against the joined plan
    // would be AMBIGUOUS whenever both sides use the same key name
    val filtered = fact.filter(
      graft.plans.BloomMightContain.probe(F.col(factKey), bloomBc))
    (filtered.join(dim, filtered(factKey) === dim(dimKey)), bloomBc)
  }

  /** Skew-safe equi-join (scale utility): salts the skewed (left)
    * side's key into `saltBuckets` sub-keys and explodes the build
    * (right) side once per salt, so one hot key spreads over
    * `saltBuckets` reducers instead of stalling a single task.
    *
    * AQE's skew-join handling covers sort-merge joins at runtime;
    * this explicit form is for when the skew is known ahead of time
    * (e.g. a null-heavy FK or a celebrity key) or AQE is unavailable.
    * `saltFrom` picks the salt source: pass a column that varies
    * within a key (a row id) for a deterministic, replayable salt;
    * the default hashes a synthetic row id (fine when only the result
    * set matters). Output columns = left ++ right (join keys
    * deduplicated). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 16,
                 saltFrom: Column = F.hash(F.monotonically_increasing_id())): DataFrame = {
    require(!(left.columns ++ right.columns).contains("__salt"),
      "saltedJoin reserves the intermediate column name '__salt'")
    // coalesce: a NULL saltFrom value must still land in SOME bucket —
    // a NULL salt would fail the inner equi-join and silently drop the
    // row, breaking the "result-identical to the plain join" contract
    val salted = left.withColumn("__salt",
      F.coalesce(F.pmod(saltFrom, F.lit(saltBuckets)), F.lit(0)))
    val exploded = right.withColumn("__salt",
      F.explode(F.array((0 until saltBuckets).map(F.lit): _*)))
    salted.join(exploded, keys :+ "__salt", "inner").drop("__salt")
  }

  /** Remote scan with the relation's constant conditions applied
    * (`relation.php:29-31`, P5). */
  private def remoteWithConditions(spark: SparkSession, sfDir: String,
                                   rel: Relation): DataFrame = {
    val remote = Tables.scan(spark, sfDir, rel.model)
    rel.conditions.foldLeft(remote) { case (df, (c, v)) =>
      df.filter(F.col(c) === F.lit(v))
    }
  }
}
