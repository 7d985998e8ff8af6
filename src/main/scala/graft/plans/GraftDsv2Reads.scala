package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.GraftTable

/** The READ half of the DSv2 door ([[graft.catalog.GraftCatalog]]):
  * every analyzed `DataSourceV2Relation` over a [[GraftTable]] is
  * replaced with the SAME pruned, snapshot-pinned V1 relation every
  * other door serves ([[graft.sources.ManifestSql.relation]] — the
  * table pins it once per analysis), output attributes re-aliased
  * under the v2 relation's exprIds so parent operators keep
  * resolving. This is the public DeltaAnalysis pattern: the v2
  * catalog owns identity, time travel, ALTER, and the write builder,
  * while ONE scan implementation (stats pruning, Bloom skipping,
  * vectorized parquet exec) serves every front door — a second DSv2
  * reader would duplicate all of it.
  *
  * Scope notes:
  *  - runs FIRST in the injected post-hoc batch, so
  *    [[ManifestSqlDml]] (same batch, later) sees v2-addressed
  *    DELETE/UPDATE/MERGE targets already in V1 shape and serves
  *    them through the ledgered copy-on-write writers — row-level
  *    DML works on `graft.db.t` without `SupportsRowLevelOperations`;
  *  - `V2WriteCommand.table` is NOT a plan child, so INSERT targets
  *    are never rewritten here — they plan through the table's own
  *    `V1Write` fallback;
  *  - subquery plans are rewritten recursively (a membership
  *    subquery may read a `graft.…` relation). */
case class GraftDsv2Reads(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    rewrite(plan, scala.collection.mutable.Set.empty)

  /** `used` tracks tables already swapped in THIS plan tree: the
    * analyzer's per-query relation cache serves ONE [[GraftTable]]
    * instance to both branches of a self-join, so a repeat occurrence
    * takes [[GraftTable.freshRelation]] (same snapshot pin, fresh
    * exprIds) — two branches sharing V1 attributes is the shape
    * DeduplicateRelations normally eliminates, but that rule has
    * already run by post-hoc time. */
  private def rewrite(plan: LogicalPlan,
                      used: scala.collection.mutable.Set[GraftTable])
      : LogicalPlan = {
    val swapped = plan.resolveOperatorsUp {
      case r @ DataSourceV2Relation(t: GraftTable, _, _, _, _, _) =>
        val v1 =
          (if (used.add(t)) t.relation else t.freshRelation)
            .queryExecution.analyzed
        val resolver = spark.sessionState.conf.resolver
        val aligned = r.output.map { out =>
          val src = v1.output.find(a => resolver(a.name, out.name))
            .getOrElse(throw new IllegalStateException(
              s"column '${out.name}' of ${t.name()} is missing from " +
                s"the manifest relation at ${t.root} — re-resolve the " +
                "table (the recorded schema moved under this plan)"))
          Alias(src, out.name)(exprId = out.exprId,
            qualifier = out.qualifier)
        }
        Project(aligned, v1)
    }
    swapped.resolveExpressions {
      case sq: SubqueryExpression
          if sq.plan.exists {
            case DataSourceV2Relation(_: GraftTable, _, _, _, _, _) => true
            case _ => false
          } => sq.withNewPlan(rewrite(sq.plan, used))
    }
  }
}
