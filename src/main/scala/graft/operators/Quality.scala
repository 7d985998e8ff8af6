package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Data-quality operators for a large-scale corpus pipeline: one-pass
  * column profiling, declarative constraint gates (the pre-training
  * "is this batch sane" check), and sketch-bounded exact heavy
  * hitters.
  *
  * The reference validates record-at-a-time on write
  * (`classes/hive/model.php:940-1026`); these are the set-level,
  * whole-table analogues a 100 TB ingest needs before any write
  * happens. All single-table checks fold into ONE aggregation over
  * ONE scan — at scale the cost is the scan, so the design never
  * pays it twice.
  */
object Quality {

  /** Per-column profile (null count, distinct count, min/max) for
    * `cols`: one single-column aggregation branch per column, unioned
    * into the long-form report.
    *
    * Why per-column branches and not one multi-DISTINCT aggregation:
    * Catalyst plans N distinct aggregates in one agg through an
    * Expand with fan-out N+1 — every input row is replicated N+1
    * times CARRYING ALL PROFILED COLUMNS before the shuffle (measured
    * 5.7 s vs 1.2 s on the 600k-row fixture). Each branch here scans
    * ONE column (columnar pruning makes |cols| branch scans read the
    * same bytes as one |cols|-wide scan), runs the standard two-phase
    * distinct with partial aggregation, and reduces to a single row —
    * narrower shuffles, no replication, embarrassingly parallel
    * across branches at any scale.
    *
    * min/max render as strings so one frame can carry heterogeneous
    * column types; numerics/timestamps reduce in their NATIVE order
    * first and only the final scalar is rendered (min-then-cast, not
    * cast-then-min — lexicographic "10" < "9" never happens).
    * Timestamps render through an explicit second-precision format so
    * external replays (the DuckDB oracle) are byte-identical.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def render(c: String)(x: Column): Column = df.schema(c).dataType match {
      case TimestampNTZType | TimestampType =>
        F.date_format(x, "yyyy-MM-dd HH:mm:ss")
      case _ => x.cast("string")
    }
    cols.map { c =>
      val col = F.col(c)
      df.agg(
          F.count(F.lit(1)).cast("long").as("n_rows"),
          (F.count(F.lit(1)) - F.count(col)).cast("long").as("n_nulls"),
          F.countDistinct(col).cast("long").as("n_distinct"),
          render(c)(F.min(col)).as("min_value"),
          render(c)(F.max(col)).as("max_value"))
        .select(F.lit(c).as("column"), F.col("n_rows"), F.col("n_nulls"),
          F.col("n_distinct"), F.col("min_value"), F.col("max_value"))
    }.reduce(_.unionByName(_))
  }

  /** Declarative table constraints. Violation semantics:
    *  - [[NotNull]]: rows where the column IS NULL.
    *  - [[Unique]]: surplus rows beyond one per distinct non-null
    *    value (`count(c) - count(DISTINCT c)`); NULLs don't collide.
    *  - [[InSet]]: non-null values outside the accepted set.
    *  - [[Check]]: rows where the predicate is not TRUE (NULL fails —
    *    a range check on a NULL value is a violation, matching the
    *    reference's NotEmpty-style strictness).
    */
  sealed trait Constraint { def name: String }
  final case class NotNull(col: String) extends Constraint {
    def name = s"not_null($col)"
  }
  final case class Unique(col: String) extends Constraint {
    def name = s"unique($col)"
  }
  final case class InSet(col: String, values: Seq[String]) extends Constraint {
    def name = s"in_set($col)"
  }
  final case class Check(label: String, predicate: Column) extends Constraint {
    def name = s"check($label)"
  }
  /** Referential integrity: child values (non-null) that have no
    * match in the parent key set. */
  final case class RefIntegrity(col: String, parent: DataFrame,
                                parentKey: String) extends Constraint {
    def name = s"ref($col)"
  }

  /** Evaluate a constraint suite → one row per constraint
    * `(constraint, violations, passed)`.
    *
    * Scale shape: every non-referential constraint folds into ONE
    * aggregation over ONE scan of `df` (conditional sums; Unique's
    * distinct counts go through the same Expand as [[profile]]).
    * Each referential rule adds one aggregate-right anti-join — the
    * parent side reduces to its distinct keys BEFORE the join, so a
    * dimension parent broadcasts and the fact side never shuffles.
    * The per-constraint 1-row frames union into one result.
    */
  def checkConstraints(df: DataFrame, cs: Seq[Constraint]): DataFrame = {
    require(cs.nonEmpty, "empty constraint suite")
    val local = cs.collect {
      case c @ NotNull(col) =>
        c.name -> F.sum(F.when(F.col(col).isNull, 1L).otherwise(0L))
      case c @ Unique(col) =>
        c.name -> (F.count(F.col(col)) - F.countDistinct(F.col(col)))
      case c @ InSet(col, vs) =>
        c.name -> F.sum(F.when(F.col(col).isNotNull &&
          !F.col(col).isin(vs: _*), 1L).otherwise(0L))
      case c @ Check(_, p) =>
        c.name -> F.sum(F.when(p, 0L).otherwise(1L))
    }
    val localFrame: Option[DataFrame] =
      if (local.isEmpty) None
      else {
        val aggs = local.map { case (n, a) => a.cast("long").as(n) }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val entries = F.explode(F.array(local.map { case (n, _) =>
          F.struct(F.lit(n).as("constraint"),
            F.col(n).as("violations"))
        }: _*))
        Some(one.select(entries.as("e"))
          .select(F.col("e.constraint").as("constraint"),
            F.col("e.violations").as("violations")))
      }
    val refFrames = cs.collect { case c @ RefIntegrity(col, parent, pk) =>
      df.select(F.col(col)).filter(F.col(col).isNotNull)
        .join(parent.select(F.col(pk).as(col)).distinct(),
          Seq(col), "left_anti")
        .agg(F.count(F.lit(1)).cast("long").as("violations"))
        .select(F.lit(c.name).as("constraint"), F.col("violations"))
    }
    (localFrame.toSeq ++ refFrames).reduce(_.unionByName(_))
      .withColumn("passed", F.col("violations") === 0L)
  }

  /** Exact heavy hitters (values with frequency > n/k) via a
    * sketch-bounds-exact two-phase plan — the 100 TB pattern where an
    * approximate pass bounds the work of the exact pass:
    *
    *  1. Per-partition Misra-Gries (capacity k) inside
    *     `mapPartitions`: by pigeonhole, an item with global
    *     frequency > n/k has per-partition frequency > n_p/k in at
    *     least one partition, and MG with k counters retains any item
    *     with frequency > n_p/(k+1) — so the union of per-partition
    *     candidate sets is a SUPERSET of the global heavy hitters.
    *     Candidate volume ≤ partitions × k, independent of n.
    *  2. Exact verify: semi-join the stream against the (broadcast)
    *     candidate set, count, and keep `cnt * k > n` — integer
    *     arithmetic, no float threshold. The output is exact and
    *     partitioning-independent (phase 1 can only over-include;
    *     phase 2 trims to the true set), so a plain GROUP BY/HAVING
    *     replays it.
    *
    * `itemsCount` is a driver-side scalar action (one long), not a
    * data collect.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"heavy-hitter k must be >= 2, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.select(F.col(itemCol).cast("string").as("item"))
    val candidates = ds.as[String].mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { item =>
        if (counts.contains(item)) counts(item) += 1L
        else if (counts.size < k) counts(item) = 1L
        else {
          // decrement-all step: drop every counter by 1, evicting
          // zeros — the classic MG maintenance, O(k) amortized over
          // the >= k arrivals that funded it
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          counts.keysIterator.foreach { kk =>
            val v = counts(kk) - 1L
            if (v <= 0L) dead += kk else counts(kk) = v
          }
          dead.foreach(counts.remove)
        }
      }
      counts.keysIterator
    }.toDF("item").distinct()
    val n = ds.count()
    ds.join(F.broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item")
      .agg(F.count(F.lit(1)).as("cnt"))
      .filter(F.col("cnt") * k > F.lit(n))
  }
}
