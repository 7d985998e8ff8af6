package graft

import graft.operators.{Joins, Skew}
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}

/** Skew-mitigation guarantees: the salted plans must (a) return
  * results identical to their plain twins and (b) actually bound the
  * hottest reducer group — (a) without (b) is a no-op, (b) without
  * (a) is a wrong answer. Run on the same hot-key derivation the
  * graded queries use (~80% of events collapse onto user 1). */
class SkewSpec extends SparkSpec {

  private val buckets = 16

  private def skewed = Tables.scan(spark, sf, "events")
    .withColumn("skew_user",
      F.when(F.col("user_id") % 5 === 0, F.col("user_id")).otherwise(F.lit(1L)))

  /** Driver-style float canonicalization (9 significant digits): a
    * two-stage sum regroups double addition, so the hot key's sum can
    * wobble in the last ulps vs the plain agg — same normalization
    * the correctness gate applies. */
  private def canon(rows: Array[org.apache.spark.sql.Row]): Set[Seq[Any]] =
    rows.map(_.toSeq.map {
      case d: Double => String.format(java.util.Locale.ROOT, "%.9g", Double.box(d))
      case x => x
    }).toSet

  test("salted agg bounds the hottest reducer group to ~hot/buckets and matches the plain agg") {
    val ev = skewed
    val hot = ev.groupBy("skew_user").count()
      .agg(F.max("count")).collect()(0).getLong(0)
    // the salted partial stage groups on (key, salt): its largest
    // group is what one reducer actually owns. event_id is dense, so
    // pmod spreads the hot key near-uniformly; allow 25% + a constant
    // of slack over the ideal hot/buckets split.
    val saltedMax = ev
      .withColumn("__s", F.pmod(F.col("event_id"), F.lit(buckets)))
      .groupBy("skew_user", "__s").count()
      .agg(F.max("count")).collect()(0).getLong(0)
    assert(hot > ev.count() / 2, s"fixture is not skewed (hot=$hot)")
    assert(saltedMax <= hot / buckets + hot / (buckets * 4) + buckets,
      s"salted partial stage still owns $saltedMax of a $hot-row hot key")
    // result identity with the plain aggregation
    val salted = canon(
      Skew.saltedAgg(ev, "skew_user", F.col("event_id"), "value", buckets).collect())
    val plain = canon(ev.groupBy("skew_user")
      .agg(F.count(F.lit(1)).as("n_rows"), F.sum("value").as("sum_value"),
        F.min("value").as("min_value"), F.max("value").as("max_value"))
      .collect())
    assert(salted == plain)
  }

  test("salted join spreads the hot key across buckets and matches the plain join") {
    val clicks = skewed.filter(F.col("event_type") === "click")
      .select(F.col("event_id"), F.col("skew_user").as("user_id"), F.col("value"))
    val dim = Tables.scan(spark, sf, "customer")
      .select(F.col("c_custkey").as("user_id"), F.col("c_name"))
    val salted = canon(Joins.saltedJoin(clicks, dim, Seq("user_id"), buckets,
        saltFrom = F.col("event_id"))
      .select("event_id", "user_id", "c_name", "value").collect())
    val plain = canon(clicks.join(dim, Seq("user_id"))
      .select("event_id", "user_id", "c_name", "value").collect())
    assert(salted == plain)
    // the salted probe side's largest (key, salt) group is the unit a
    // reducer owns after salting
    val hot = clicks.groupBy("user_id").count()
      .agg(F.max("count")).collect()(0).getLong(0)
    val saltedMax = clicks
      .withColumn("__s", F.pmod(F.col("event_id"), F.lit(buckets)))
      .groupBy("user_id", "__s").count()
      .agg(F.max("count")).collect()(0).getLong(0)
    assert(saltedMax <= hot / buckets + hot / (buckets * 4) + buckets,
      s"salted join side still owns $saltedMax of a $hot-row hot key")
  }

  test("AQE skew-join handling splits the hot partition at runtime") {
    // the runtime half of the skew story: manual salting is the
    // deterministic-plan fix, AQE's OptimizeSkewedJoin is the
    // zero-code-change one — pin that our session conventions don't
    // break it. Thresholds are lowered so the sf0.001 fixture's hot
    // key (~80% of rows) qualifies as skewed.
    val prev = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // repartition(8) first: AQE splits a skewed partition by
      // reassembling per-MAPPER output chunks, so a shuffle fed by a
      // single mapper (the fixture is one small parquet file → one
      // scan task) is unsplittable no matter how skewed it is
      val clicks = skewed
        .select(F.col("event_id"), F.col("skew_user").as("user_id"),
          F.col("value"), F.col("props"))
        .repartition(8)
      val dim = Tables.scan(spark, sf, "customer")
        .select(F.col("c_custkey").as("user_id"), F.col("c_name"))
      val joined = clicks.join(dim, Seq("user_id"))
      // collect() drives THIS DataFrame's queryExecution, so the
      // AdaptiveSparkPlan below is the finalized one (a write would
      // spawn its own execution and leave this plan un-finalized)
      // collect() on `joined` ITSELF finalizes its AdaptiveSparkPlan;
      // a derived select would execute its own plan and leave this
      // one un-finalized
      joined.collect()
      val got = canon(joined
        .select("event_id", "user_id", "c_name", "value").collect())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot join partition as skewed:\n${plan.take(800)}")
      // the runtime split is a pure plan transform — same rows as the
      // plain (and salted) join. Where AQE CANNOT do this (skewed
      // aggregations, streaming/stateful joins, single-mapper
      // shuffles), Skew.saltedAgg / Joins.saltedJoin remain the fix —
      // see the Skew scaladoc for the full decision table.
      val want = canon(skewed
        .select(F.col("event_id"), F.col("skew_user").as("user_id"),
          F.col("value"))
        .join(dim, Seq("user_id"))
        .select("event_id", "user_id", "c_name", "value").collect())
      assert(got == want, "AQE skew split changed the join result")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("salted ops keep rows whose salt source is NULL") {
    import spark.implicits._
    val left = Seq((1L, Some(10L), 1.0), (1L, None, 2.0), (2L, Some(11L), 3.0))
      .toDF("k", "rid", "v")
    val right = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    // NULL rid pmods to NULL; the coalesce must land it in bucket 0
    // instead of silently dropping the row from the inner equi-join
    val joined = Joins.saltedJoin(left, right, Seq("k"), 4,
      saltFrom = F.col("rid"))
    assert(joined.count() == 3, "NULL-salt row lost by saltedJoin")
    val agg = Skew.saltedAgg(left, "k", F.col("rid"), "v", 4)
    val n = agg.filter(F.col("k") === 1).select("n_rows").as[Long].collect()(0)
    assert(n == 2, "NULL-salt row lost by saltedAgg")
  }
}
