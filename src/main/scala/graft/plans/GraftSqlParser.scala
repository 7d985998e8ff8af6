package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParameterContext,
  ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType,
  StructType}

import graft.operators.ManifestTable

/** Maintenance DDL for manifest tables — the `injectParser` seam (the
  * Delta-SQL-parser pattern): a thin wrapper that owns a four-statement
  * grammar and DELEGATES everything else, byte for byte, to the
  * session parser it wraps.
  *
  * {{{
  *   GRAFT COMPACT '<root>' [TARGET <bytes>] [CLUSTER BY c1[, c2…]]
  *   GRAFT VACUUM '<root>' [RETAIN <n> HOURS]
  *   GRAFT EXPIRE '<root>' KEEP <k>
  *   GRAFT MAINTAIN '<root>' [TARGET <bytes>] [CLUSTER BY c1[, c2…]]
  * }}}
  *
  * Each statement is a runnable command over the corresponding
  * [[ManifestTable]] op and RETURNS its report as rows (files after
  * compaction, swept count, expired versions…), so an operator can
  * run table upkeep from any SQL-only surface — a scheduler, a JDBC
  * console — without the Scala API. The trigger word is the first
  * token being `GRAFT`, which no ANSI statement starts with, so the
  * wrapper never shadows standard SQL; a malformed GRAFT statement
  * fails with the usage line rather than falling through to a
  * confusing ANSI parse error. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraft(sqlText).getOrElse(
      rewriteAlter(session, delegate.parsePlan(sqlText)))

  // parameterized spark.sql(text, args) must keep its binding — only
  // intercept our grammar (which has no parameters), else delegate the
  // PARAMETERIZED entry point, not parsePlan
  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    parseGraft(sqlText).getOrElse(rewriteAlter(session,
      delegate.parsePlanWithParameters(sqlText, ctx)))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  private val DefaultTargetBytes = 128L * 1024 * 1024

  // '<root>' with '' as the escaped quote (standard SQL string)
  private val RootRe = "'((?:[^']|'')*)'"
  private val CompactRe =
    ("""(?is)^\s*GRAFT\s+COMPACT\s+""" + RootRe +
      """(?:\s+TARGET\s+(\d+))?(?:\s+CLUSTER\s+BY\s+([\w\s,]+?))?\s*;?\s*$""").r
  private val VacuumRe =
    ("""(?is)^\s*GRAFT\s+VACUUM\s+""" + RootRe +
      """(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*$""").r
  private val ExpireRe =
    ("""(?is)^\s*GRAFT\s+EXPIRE\s+""" + RootRe +
      """\s+KEEP\s+(\d+)\s*;?\s*$""").r
  private val MaintainRe =
    ("""(?is)^\s*GRAFT\s+MAINTAIN\s+""" + RootRe +
      """(?:\s+TARGET\s+(\d+))?(?:\s+CLUSTER\s+BY\s+([\w\s,]+?))?\s*;?\s*$""").r

  private def unquote(s: String): String = s.replace("''", "'")
  private def cols(s: String): Seq[String] =
    Option(s).toSeq.flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))

  private[plans] def parseGraft(sqlText: String): Option[LogicalPlan] = {
    if (!sqlText.trim.toUpperCase(java.util.Locale.ROOT)
      .startsWith("GRAFT")) return None
    sqlText match {
      case CompactRe(root, target, by) =>
        Some(GraftCompactCommand(unquote(root),
          Option(target).map(_.toLong).getOrElse(DefaultTargetBytes),
          cols(by)))
      case VacuumRe(root, hours) =>
        Some(GraftVacuumCommand(unquote(root),
          Option(hours).map(_.toLong * 3600 * 1000)
            .getOrElse(24L * 3600 * 1000)))
      case ExpireRe(root, keep) =>
        Some(GraftExpireCommand(unquote(root), keep.toInt))
      case MaintainRe(root, target, by) =>
        Some(GraftMaintainCommand(unquote(root),
          Option(target).map(_.toLong).getOrElse(DefaultTargetBytes),
          cols(by)))
      case _ => throw new IllegalArgumentException(
        "malformed GRAFT statement — usage:\n" +
          "  GRAFT COMPACT '<root>' [TARGET <bytes>] [CLUSTER BY c1[, c2…]]\n" +
          "  GRAFT VACUUM '<root>' [RETAIN <n> HOURS]\n" +
          "  GRAFT EXPIRE '<root>' KEEP <k>\n" +
          "  GRAFT MAINTAIN '<root>' [TARGET <bytes>] [CLUSTER BY c1[, c2…]]")
    }
  }

  /** `ALTER TABLE t RENAME COLUMN a TO b` / `ALTER TABLE t DROP
    * COLUMN[S] [IF EXISTS] …` re-routed to the manifest schema
    * ledger when `t` is a session-catalog `graft-manifest` table.
    * This MUST happen at parse time: the statements are v2-only, so
    * `ResolveSessionCatalog` throws `unsupportedTableOperationError`
    * for a V1 target DURING resolution — no injected resolution or
    * post-hoc rule ever sees the plan. Non-manifest targets (and any
    * lookup failure) pass through untouched and keep the stock
    * behavior. Top-level columns only — nested paths refuse with the
    * reason named. */
  private def rewriteAlter(session: SparkSession,
                           plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedFieldName,
      UnresolvedTable}
    import org.apache.spark.sql.catalyst.plans.logical.{DropColumns,
      RenameColumn}
    def manifestIdent(u: UnresolvedTable): Option[TableIdentifier] = {
      val parts = u.multipartIdentifier match {
        case Seq(cat, db, t)
            if cat.equalsIgnoreCase("spark_catalog") => Seq(db, t)
        case p => p
      }
      val ident = parts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case _ => return None
      }
      val cat = session.sessionState.catalog
      val isManifest = scala.util.Try(
        cat.tableExists(ident) && !cat.isTempView(ident) &&
          cat.getTableMetadata(ident).provider
            .exists(_.equalsIgnoreCase("graft-manifest"))).getOrElse(false)
      if (isManifest) Some(ident) else None
    }
    def topLevel(name: Seq[String], verb: String): String = name match {
      case Seq(col) => col
      case nested => throw new UnsupportedOperationException(
        s"manifest $verb renames/drops top-level columns only; " +
          s"'${nested.mkString(".")}' is nested")
    }
    plan match {
      case RenameColumn(u: UnresolvedTable, UnresolvedFieldName(name),
          newName) =>
        manifestIdent(u).map(ident => ManifestSqlAlter.RenameColumnCommand(
          ident, topLevel(name, "RENAME COLUMN"), newName): LogicalPlan)
          .getOrElse(plan)
      case DropColumns(u: UnresolvedTable, cols, ifExists) =>
        manifestIdent(u).map { ident =>
          val names = cols.map {
            case UnresolvedFieldName(name) =>
              topLevel(name, "DROP COLUMN")
            case other => throw new IllegalStateException(
              s"unexpected field shape in DROP COLUMN: $other")
          }
          ManifestSqlAlter.DropColumnsCommand(ident, names,
            ifExists): LogicalPlan
        }.getOrElse(plan)
      case other => other
    }
  }

  case class GraftCompactCommand(root: String, targetBytes: Long,
                                 clusterBy: Seq[String])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", IntegerType, nullable = false)(),
      AttributeReference("files", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val snap = ManifestTable.compact(session, root, targetBytes,
        clusterBy = clusterBy)
      session.catalog.refreshByPath(root)
      Seq(Row(snap.version, snap.files.size.toLong))
    }
  }

  case class GraftVacuumCommand(root: String, graceMillis: Long)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("swept_files", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(ManifestTable.vacuum(root, graceMillis).size.toLong))
  }

  case class GraftExpireCommand(root: String, keep: Int)
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("expired_versions", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] =
      Seq(Row(ManifestTable.expireManifests(root, keep).size.toLong))
  }

  case class GraftMaintainCommand(root: String, targetBytes: Long,
                                  clusterBy: Seq[String])
    extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("version", IntegerType, nullable = false)(),
      AttributeReference("files", LongType, nullable = false)(),
      AttributeReference("compacted", BooleanType, nullable = false)(),
      AttributeReference("expired_versions", LongType, nullable = false)(),
      AttributeReference("swept_files", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val m = ManifestTable.maintain(session, root, targetBytes,
        clusterBy = clusterBy)
      session.catalog.refreshByPath(root)
      Seq(Row(m.snapshot.version, m.snapshot.files.size.toLong,
        m.compacted, m.expired.size.toLong, m.vacuumed.size.toLong))
    }
  }
}
