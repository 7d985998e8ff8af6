package graft.plans

import scala.annotation.tailrec

import org.apache.spark.sql.{Column, Row, SparkSession, functions => F,
  graftbridge}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast,
  EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

import graft.sources.ManifestSql

/** SQL row-level DML on manifest tables: `DELETE FROM`, `UPDATE`, and
  * `MERGE INTO` rewritten to the ledgered copy-on-write writers —
  * the one lakehouse write shape the SQL front door was still missing
  * after the r17 insert path.
  *
  * Spark's parser produces [[DeleteFromTable]] / [[UpdateTable]] /
  * [[MergeIntoTable]] logical plans and its analyzer fully resolves
  * them over a V1 relation (star actions expand into per-column
  * assignments) — but only a DSv2 `SupportsRowLevelOperations` table
  * gets a rewrite, so V1 targets die in `checkAnalysis` with "only
  * supported with v2 tables". This post-hoc resolution rule (the
  * Delta-analysis seam, same batch as [[ManifestSqlInserts]]) matches
  * the resolved plans whose target digs down to a
  * [[ManifestSql.ManifestFileIndex]] relation and rewrites them into
  * runnable commands over the Scala writers, which already own the
  * semantics end to end:
  *
  *  - `DELETE FROM t WHERE p` → `ManifestTable.deleteWhere` — the
  *    victim scan prunes through per-file bounds + Blooms, rewrites
  *    only affected files, restarts on commit conflict;
  *  - `UPDATE t SET c = e, … WHERE p` → `ManifestTable.updateWhere`;
  *  - `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE
  *    SET * WHEN NOT MATCHED THEN INSERT *` →
  *    `ManifestTable.upsert` (whole-row replace-or-insert by key) —
  *    or `upsertBatch` when [[ManifestSql.BatchIdConf]] is set, so a
  *    replayed MERGE no-ops against the batch ledger;
  *  - `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN DELETE`
  *    (alone) → `ManifestTable.deleteIds` — the key-list takedown;
  *  - every OTHER merge shape — conditional matched clauses, partial
  *    `UPDATE SET c = e`, multiple WHEN arms, conditional inserts,
  *    COMPOSITE ON keys (a conjunction of equalities),
  *    `WHEN NOT MATCHED BY SOURCE THEN UPDATE/DELETE` —
  *    → `ManifestTable.mergeInto`, the general copy-on-write merge
  *    (clauses translated with source attributes re-addressed under
  *    the merge frame's `__s_` prefix).
  *
  * DELETE/UPDATE predicates may carry ANY NUMBER of membership
  * terms as top-level conjuncts — UNCORRELATED `col IN (SELECT …)`
  * and `[NOT] EXISTS (SELECT … WHERE s.k = t.col [AND inner…])`
  * with exactly one equality correlation — each materializing as a
  * values frame of `deleteWhereTerms` / `updateWhereTerms` (joins,
  * unbounded, victim scan pruned by the residue AND every positive
  * term's value set).
  *
  * Still refused LOUDLY with the exact unsupported piece named:
  * non-equality or disjunctive ON conditions (no key to join and
  * prune by), `WITH SCHEMA EVOLUTION`, correlated IN / multi-
  * equality EXISTS and `NOT IN` (no sound V1 frame-join twin;
  * NOT EXISTS' anti semantics ARE sound and supported), subqueries
  * anywhere but those terms (merge clause conditions, update
  * values), and
  * time-travel registrations (writes need the head). Predicates and
  * update values re-resolve BY NAME against the table's fresh read
  * frame — the rule's plan-time attributes belong to the
  * registration's pinned snapshot, the write's victim scan runs
  * against the head. */
case class ManifestSqlDml(spark: SparkSession) extends Rule[LogicalPlan] {

  import ManifestSqlDml._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case d @ DeleteFromTable(tgt @ ManifestTarget(idx), cond)
          if d.childrenResolved && cond.resolved =>
        extractMembership(cond, tgt, "DELETE") match {
          case None => ManifestDeleteCommand(idx, byName(cond))
          case Some(m) => ManifestDeleteInCommand(idx,
            m.residue.map(byName), m.terms)
        }

      case u @ UpdateTable(tgt @ ManifestTarget(idx), assignments, cond)
          if u.childrenResolved && cond.forall(_.resolved) =>
        val pairs = assignments.map {
          case Assignment(key: AttributeReference, value) =>
            refuseSubquery(value, "UPDATE")
            val v = byName(value)
            key.name -> (if (value.dataType == key.dataType) v
              else v.cast(key.dataType))
          case Assignment(other, _) => throw new UnsupportedOperationException(
            "manifest SQL UPDATE assigns whole columns only — " +
              s"'${other.sql}' is not a column of the target table")
        }
        cond.flatMap(extractMembership(_, tgt, "UPDATE")) match {
          case None =>
            ManifestUpdateCommand(idx,
              cond.map(byName).getOrElse(F.lit(true)), pairs)
          case Some(m) => ManifestUpdateInCommand(idx,
            m.residue.map(byName), m.terms, pairs)
        }

      case m @ MergeIntoTable(tgt @ ManifestTarget(idx), source, cond,
          matched, notMatched, notMatchedBySource, withSchemaEvolution)
          if m.childrenResolved && m.expressions.forall(_.resolved) =>
        require(!withSchemaEvolution,
          "manifest SQL MERGE does not support WITH SCHEMA EVOLUTION — " +
            "evolve the schema with an append or ALTER first")
        refuseSubquery(cond, "MERGE")
        val idKeys = mergeKeysOf(tgt, source, cond)
        (matched, notMatched, notMatchedBySource) match {
          // upsert shape: UPDATE SET * + INSERT * (whole-row
          // replace-or-insert — the CDC apply shape); kept as a fast
          // path: the update rows append directly, no join rewrite.
          // Single-key only — the composite shape goes general, and
          // so does any unconditional pair that ISN'T whole-row
          // (partial update, narrower insert, key-drifting insert —
          // all legal ANSI, upsertPlanOf answers None for them).
          case (Seq(UpdateAction(None, uAssigns, _)),
                Seq(InsertAction(None, iAssigns)), Seq())
              if idKeys.size == 1 =>
            upsertPlanOf(tgt, idKeys.head, uAssigns, iAssigns) match {
              case Some(plan) =>
                ManifestMergeUpsertCommand(idx, idKeys.head.name,
                  source, plan)
              case None => generalMerge(idx, idKeys, tgt, source,
                matched, notMatched, notMatchedBySource)
            }
          // key-list delete shape: WHEN MATCHED THEN DELETE alone
          case (Seq(DeleteAction(None)), Seq(), Seq())
              if idKeys.size == 1 =>
            ManifestMergeDeleteCommand(idx, idKeys.head.name, source,
              stripCast(idKeys.head.sourceSide))
          // everything else — conditional / partial / multi-clause /
          // composite-key / NOT MATCHED BY SOURCE — is the general
          // copy-on-write merge
          case _ =>
            generalMerge(idx, idKeys, tgt, source,
              matched, notMatched, notMatchedBySource)
        }
    }
}

object ManifestSqlDml {

  /** Dig through the alias/view wrapping the analyzer leaves over a
    * registered manifest table to its [[ManifestSql.ManifestFileIndex]].
    * Matches the BARE relation only: a rename-chained registration
    * serves a coalesce Project, which (exactly like SQL INSERT) is
    * not a writable shape — the dig stops at any real operator. The
    * one Project shape that IS walked through: a pure IDENTITY
    * re-alias (every item an attribute, or an alias of one, under
    * its own name) — what [[GraftDsv2Reads]] stamps over the V1
    * relation to keep the v2 exprIds resolving, which changes no
    * row and no column. */
  private object ManifestTarget {
    private def identityRealias(p: Project): Boolean =
      p.projectList.size == p.child.output.size &&
        p.projectList.forall {
          case a: AttributeReference => true
          case a @ org.apache.spark.sql.catalyst.expressions.Alias(
              c: AttributeReference, _) => a.name == c.name
          case _ => false
        }
    @tailrec private def dig(p: LogicalPlan)
        : Option[ManifestSql.ManifestFileIndex] = p match {
      case SubqueryAlias(_, child) => dig(child)
      case v: View => dig(v.child)
      case pr: Project if identityRealias(pr) => dig(pr.child)
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location match {
          case m: ManifestSql.ManifestFileIndex => Some(m)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
    def unapply(p: LogicalPlan): Option[ManifestSql.ManifestFileIndex] =
      dig(p)
  }

  /** Re-resolve a plan-time expression BY NAME: the rule's attributes
    * are bound to the registration's pinned relation, but the writers
    * scan the table head fresh — column names are the stable identity
    * (unique on a manifest table by construction). `With` common-
    * expression wrappers (how the analyzer lands `nullif` & friends)
    * are inlined FIRST, while the tree is still fully resolved —
    * their reconstruction eagerly computes `dataType`, which an
    * injected [[UnresolvedAttribute]] cannot answer. Inlining
    * duplicates the shared sub-expression; the re-analysis of the
    * writer's filter re-extracts it. `rename` picks the name each
    * attribute re-resolves under — the merge translator maps source
    * attrs to their merge-frame `__s_` alias through it. */
  private def byNameWith(e: Expression)
                        (rename: AttributeReference => String): Column = {
    import org.apache.spark.sql.catalyst.expressions.{CommonExpressionRef,
      With}
    val inlined = e.transformUp {
      case w: With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: CommonExpressionRef if defs.contains(r.id) => defs(r.id)
        }
    }
    graftbridge.toColumn(inlined.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(rename(a))
    })
  }

  private def byName(e: Expression): Column = byNameWith(e)(_.name)

  /** Translate the GENERAL MERGE shape — conditional / partial /
    * multi-clause / `NOT MATCHED BY SOURCE` — into
    * [[graft.operators.ManifestTable.mergeInto]] clauses. Plan-time
    * expressions re-resolve by name over the writer's merge frame:
    * target attributes under their own names, source attributes
    * under the frame's `__s_` prefix ([[graft.operators.ManifestTable
    * .sourceCol]]) — so colliding names stay unambiguous. Assignment
    * values cast to the target column's type exactly as UPDATE's do;
    * subqueries refuse in every clause. */
  private def generalMerge(idx: ManifestSql.ManifestFileIndex,
                           idKeys: Seq[MergeKey], tgt: LogicalPlan,
                           source: LogicalPlan,
                           matched: Seq[MergeAction],
                           notMatched: Seq[MergeAction],
                           notMatchedBySource: Seq[MergeAction])
      : LogicalPlan = {
    import graft.operators.{ManifestTable => MT}
    val tgtSet = tgt.outputSet
    def overFrame(e: Expression): Column = {
      refuseSubquery(e, "MERGE")
      byNameWith(e)(a =>
        if (tgtSet.contains(a)) a.name else MT.SourcePrefix + a.name)
    }
    def assignsOf(as: Seq[Assignment], which: String)
        : Map[String, Column] =
      as.map {
        case Assignment(k: AttributeReference, v) =>
          val col = overFrame(v)
          k.name -> (if (v.dataType == k.dataType) col
            else col.cast(k.dataType))
        case Assignment(other, _) => throw new UnsupportedOperationException(
          s"manifest SQL MERGE $which assigns whole columns only — " +
            s"'${other.sql}' is not a column of the target table")
      }.toMap
    def matchedOf(which: String)(a: MergeAction): MT.WhenMatched = a match {
      case UpdateAction(c, as, _) =>
        MT.WhenMatched(c.map(overFrame), MT.MergeUpdate(assignsOf(as, which)))
      case DeleteAction(c) =>
        MT.WhenMatched(c.map(overFrame), MT.MergeDelete)
      case other => throw new UnsupportedOperationException(
        s"manifest SQL MERGE $which supports UPDATE and DELETE " +
          s"actions only; got ${other.getClass.getSimpleName}")
    }
    val nm = notMatched.map {
      case InsertAction(c, as) =>
        MT.WhenNotMatched(c.map(overFrame), assignsOf(as, "INSERT"))
      case other => throw new UnsupportedOperationException(
        "manifest SQL MERGE WHEN NOT MATCHED supports INSERT only; " +
          s"got ${other.getClass.getSimpleName}")
    }
    // the ON keys evaluate over the BARE source frame (original
    // names) — they feed the merge keys before the frame renames
    ManifestMergeIntoCommand(idx, idKeys.map(_.name), source,
      idKeys.map(k => byName(k.sourceSide)),
      matched.map(matchedOf("UPDATE")), nm,
      notMatchedBySource.map(matchedOf("NOT MATCHED BY SOURCE")))
  }

  private def refuseSubquery(e: Expression, verb: String): Unit =
    require(!SubqueryExpression.hasSubquery(e),
      s"manifest SQL $verb does not support subqueries in its " +
        "condition — materialize the subquery and MERGE on its key, " +
        "or use the ManifestTable Scala API")

  /** One membership term extracted from a DML predicate: the member
    * target column, the one-column values plan, and polarity
    * (`negated = true` for `NOT EXISTS`). */
  private[plans] final case class TermSpec(col: String,
                                           values: LogicalPlan,
                                           negated: Boolean)

  /** The membership terms of a DML predicate plus the subquery-free
    * residue. */
  private final case class Membership(residue: Option[Expression],
                                      terms: Seq[TermSpec])

  /** Decompose a DML predicate with subqueries into `residue AND
    * term1 AND term2 …`, each term a shape [[graft.operators
    * .ManifestTable.deleteWhereTerms]]/`updateWhereTerms` serve with
    * frame joins (no V1 seam exists for the general v2 subquery
    * rewrite):
    *
    *  - `col IN (SELECT …)`, UNCORRELATED — the subquery is the
    *    values frame;
    *  - `EXISTS (SELECT … WHERE s.k = t.col [AND inner…])` /
    *    `NOT EXISTS (…)` with exactly ONE equality correlating one
    *    TARGET column to one inner expression — equivalent to
    *    `t.col IN/anti-join (SELECT k FROM s WHERE inner…)`, the
    *    sound frame twin (a NULL `t.col` equality-matches nothing,
    *    which is exactly EXISTS' semantics on both polarities).
    *
    * Returns None when the predicate has NO subquery (the plain
    * path). Refuses loudly: a disjunctive placement (terms must be
    * top-level conjuncts), `NOT IN` (its three-valued NULL semantics
    * have no sound frame-join twin), correlated IN, uncorrelated
    * EXISTS (it is a row-independent constant — evaluate it and drop
    * the conjunct), multi-equality or non-equality correlation,
    * multi-column IN tuples, and non-column member expressions. */
  private def extractMembership(cond: Expression, tgt: LogicalPlan,
                                verb: String): Option[Membership] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, And, Exists,
      InSubquery, ListQuery, Not, OuterReference}
    if (!SubqueryExpression.hasSubquery(cond)) return None
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def targetCol(v: Expression, what: String): String =
      stripCast(v) match {
        case a: AttributeReference if tgt.outputSet.contains(a) => a.name
        case other => throw new UnsupportedOperationException(
          s"manifest SQL $verb $what must be one target column; " +
            s"got '${other.sql}'")
      }
    // `[NOT] EXISTS (SELECT … WHERE s.k = t.col AND inner…)` → the
    // values plan `SELECT k FROM s WHERE inner…` + the target column:
    // dig to the subquery's top filter (through the trivial SELECT-1
    // projection), split its conjuncts by outer-reference use, and
    // demand exactly one outer equality
    def existsTerm(e: Exists, negated: Boolean): TermSpec = {
      require(e.outerAttrs.nonEmpty,
        s"manifest SQL $verb: an UNCORRELATED EXISTS is a constant " +
          "(the subquery is row-independent) — evaluate it and drop " +
          "the conjunct")
      def hasOuter(x: Expression): Boolean =
        x.exists(_.isInstanceOf[OuterReference])
      val (filterCond, child) = e.plan match {
        case Project(_, Filter(c, ch)) => (c, ch)
        case Filter(c, ch) => (c, ch)
        case other => throw new UnsupportedOperationException(
          s"manifest SQL $verb EXISTS must be a filtered SELECT " +
            s"(got ${other.nodeName}) — use the Scala API for more")
      }
      val (outer, inner) = conjuncts(filterCond).partition(hasOuter)
      val (attr, innerSide) = outer match {
        case Seq(EqualTo(a, b)) =>
          def split(x: Expression, y: Expression)
              : Option[(Expression, Expression)] = stripCast(x) match {
            case OuterReference(o) if !hasOuter(y) => Some((o, y))
            case _ => None
          }
          split(a, b).orElse(split(b, a)).getOrElse(
            throw new UnsupportedOperationException(
              s"manifest SQL $verb EXISTS must correlate as " +
                "'<inner expr> = <target column>' exactly once; got " +
                s"'${EqualTo(a, b).sql}'"))
        case other => throw new UnsupportedOperationException(
          s"manifest SQL $verb EXISTS needs exactly ONE equality " +
            "conjunct correlating the target (and any number of " +
            s"inner-only conjuncts); got ${other.size} correlated " +
            "conjunct(s)")
      }
      val col = targetCol(attr, "EXISTS correlation")
      require(inner.forall(!SubqueryExpression.hasSubquery(_)),
        s"manifest SQL $verb EXISTS must not nest further subqueries")
      val filtered = inner.reduceOption(And)
        .map(Filter(_, child)).getOrElse(child)
      TermSpec(col,
        Project(Seq(Alias(innerSide, s"__exists_key")()), filtered),
        negated)
    }
    val (subq, rest) = conjuncts(cond)
      .partition(SubqueryExpression.hasSubquery)
    val terms = subq.map {
      case InSubquery(Seq(v), lq: ListQuery) =>
        require(lq.outerAttrs.isEmpty,
          s"manifest SQL $verb supports UNCORRELATED IN subqueries " +
            "only — a correlated IN has no V1 rewrite; use " +
            "EXISTS-with-one-equality, MERGE, or the Scala API")
        TermSpec(targetCol(v, "IN-subquery member"), lq.plan,
          negated = false)
      case Not(_: InSubquery) =>
        throw new UnsupportedOperationException(
          s"manifest SQL $verb does not support NOT IN (SELECT …) — " +
            "its three-valued NULL semantics have no sound frame-join " +
            "twin; use NOT EXISTS (whose anti semantics ARE sound), " +
            "or the Scala API")
      case e: Exists => existsTerm(e, negated = false)
      case Not(e: Exists) => existsTerm(e, negated = true)
      case other => throw new UnsupportedOperationException(
        s"manifest SQL $verb supports subqueries only as top-level " +
          "'col IN (SELECT …)' / '[NOT] EXISTS (…)' AND-conjuncts; " +
          s"got '${other.sql}'")
    }
    Some(Membership(rest.reduceOption(And), terms))
  }

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** The merge key(s): the ON condition must be a CONJUNCTION of
    * equalities, each between one distinct TARGET column and one
    * source-side expression — the (possibly composite) key the
    * manifest merge joins and prunes by. Anything else (OR,
    * non-equality, target-vs-target, a column keyed twice) refuses
    * with the exact unsupported piece named. */
  private final case class MergeKey(name: String, targetAttr: AttributeReference,
                                    sourceSide: Expression)

  private def mergeKeysOf(tgt: LogicalPlan, source: LogicalPlan,
                          cond: Expression): Seq[MergeKey] = {
    val tgtIds = tgt.outputSet
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def sideOf(a: Expression, b: Expression): Option[MergeKey] =
      stripCast(a) match {
        case attr: AttributeReference if tgtIds.contains(attr) &&
            stripCast(b).references.subsetOf(source.outputSet) =>
          Some(MergeKey(attr.name, attr, b))
        case _ => None
      }
    val keys = conjuncts(cond).map {
      case EqualTo(l, r) =>
        sideOf(l, r).orElse(sideOf(r, l)).getOrElse(
          throw new UnsupportedOperationException(
            "manifest SQL MERGE needs ON <target column> = <source " +
              s"expression> per conjunct; got '${EqualTo(l, r).sql}'"))
      case other => throw new UnsupportedOperationException(
        "manifest SQL MERGE merges by equality key(s) — " +
          s"'${other.sql}' in the ON condition is not an equality " +
          "conjunct; use the Scala API for non-equi merge logic")
    }
    require(keys.map(_.name).distinct.size == keys.size,
      "manifest SQL MERGE keys each target column at most once in " +
        s"the ON condition; got ${keys.map(_.name).mkString(",")}")
    keys
  }

  /** Is this unconditional UPDATE+INSERT pair the WHOLE-ROW
    * replace-or-insert shape the upsert fast path serves? Some(the
    * aliased projection in TARGET column order) when every target
    * column is assigned from the source, the MATCHED assignments are
    * semantically identical to the INSERT ones (whole-row replace =
    * insert row), and the ON key IS the inserted key (a matched row
    * must be replaced under the identity it matched on); None for
    * every other pair — partial updates, narrower inserts, drifted
    * or key-shifting assignments are all legal ANSI merges, they
    * just run through the general copy-on-write path instead. */
  private def upsertPlanOf(tgt: LogicalPlan, idKey: MergeKey,
                           uAssigns: Seq[Assignment],
                           iAssigns: Seq[Assignment])
      : Option[Seq[(String, Expression)]] = {
    def keyed(as: Seq[Assignment]): Option[Map[String, Expression]] = {
      val pairs = as.collect {
        case Assignment(k: AttributeReference, v) => k.name -> v
      }
      if (pairs.size == as.size) Some(pairs.toMap) else None
    }
    for {
      uMap <- keyed(uAssigns)
      iMap <- keyed(iAssigns)
      targetCols = tgt.output.map(_.name)
      if targetCols.forall(iMap.contains)
      if uMap.keySet == iMap.keySet
      if targetCols.forall(c =>
        uMap.get(c).forall(_.semanticEquals(iMap(c))))
      if stripCast(iMap(idKey.name))
        .semanticEquals(stripCast(idKey.sourceSide))
    } yield targetCols.map(c => c -> iMap(c))
  }

  /** `DELETE FROM <manifest table> WHERE p` as a runnable command —
    * a thin shell over [[ManifestSql.sqlDelete]], the one owner. */
  case class ManifestDeleteCommand(index: ManifestSql.ManifestFileIndex,
                                   predicate: Column)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      ManifestSql.sqlDelete(session, index, predicate)
      Seq.empty
    }
  }

  /** `DELETE FROM t WHERE [p AND] <membership terms>` — each
    * subquery materializes as a values FRAME of [[graft.operators
    * .ManifestTable.deleteWhereTerms]] (joins, unbounded). */
  case class ManifestDeleteInCommand(index: ManifestSql.ManifestFileIndex,
                                     residue: Option[Column],
                                     terms: Seq[TermSpec])
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = terms.map(_.values)
    override def run(session: SparkSession): Seq[Row] = {
      ManifestSql.sqlDeleteIn(session, index, residue,
        terms.map(t => graft.operators.ManifestTable.MembershipTerm(
          t.col, graftbridge.ofRows(session, t.values), t.negated)))
      Seq.empty
    }
  }

  /** `UPDATE t SET … WHERE [p AND] <membership terms>`. */
  case class ManifestUpdateInCommand(index: ManifestSql.ManifestFileIndex,
                                     residue: Option[Column],
                                     terms: Seq[TermSpec],
                                     assignments: Seq[(String, Column)])
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = terms.map(_.values)
    override def run(session: SparkSession): Seq[Row] = {
      ManifestSql.sqlUpdateIn(session, index, residue,
        terms.map(t => graft.operators.ManifestTable.MembershipTerm(
          t.col, graftbridge.ofRows(session, t.values), t.negated)),
        assignments)
      Seq.empty
    }
  }

  /** `UPDATE <manifest table> SET … WHERE p` as a runnable command. */
  case class ManifestUpdateCommand(index: ManifestSql.ManifestFileIndex,
                                   predicate: Column,
                                   assignments: Seq[(String, Column)])
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      ManifestSql.sqlUpdate(session, index, predicate, assignments)
      Seq.empty
    }
  }

  /** Upsert-shaped MERGE: project the source through the INSERT
    * assignments (resolved expressions over the source plan — same
    * exprIds, so no re-resolution needed) into target column order,
    * then replace-or-insert by the key. */
  case class ManifestMergeUpsertCommand(index: ManifestSql.ManifestFileIndex,
                                        idCol: String, source: LogicalPlan,
                                        projection: Seq[(String, Expression)])
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(session: SparkSession): Seq[Row] = {
      val updates = graftbridge.ofRows(session, source)
        .select(projection.map { case (name, e) =>
          graftbridge.toColumn(e).as(name) }: _*)
      ManifestSql.sqlMergeUpsert(session, index, idCol, updates)
      Seq.empty
    }
  }

  /** General MERGE: clause-translated [[graft.operators.ManifestTable
    * .mergeInto]] over the analyzed source plan — conditional,
    * partial, multi-clause, and `NOT MATCHED BY SOURCE` shapes,
    * ledgered under [[ManifestSql.BatchIdConf]] exactly like the
    * upsert fast path. */
  case class ManifestMergeIntoCommand(
      index: ManifestSql.ManifestFileIndex, idCols: Seq[String],
      source: LogicalPlan, sourceKeys: Seq[Column],
      matched: Seq[graft.operators.ManifestTable.WhenMatched],
      notMatched: Seq[graft.operators.ManifestTable.WhenNotMatched],
      notMatchedBySource: Seq[graft.operators.ManifestTable.WhenMatched])
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(session: SparkSession): Seq[Row] = {
      ManifestSql.sqlMergeInto(session, index, idCols,
        graftbridge.ofRows(session, source), sourceKeys,
        matched, notMatched, notMatchedBySource)
      Seq.empty
    }
  }

  /** Delete-shaped MERGE: the source's key expression is the victim
    * id list. */
  case class ManifestMergeDeleteCommand(index: ManifestSql.ManifestFileIndex,
                                        idCol: String, source: LogicalPlan,
                                        key: Expression)
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(session: SparkSession): Seq[Row] = {
      val victims = graftbridge.ofRows(session, source)
        .select(graftbridge.toColumn(key).as("__victim_id"))
      ManifestSql.sqlMergeDelete(session, index, idCol, victims)
      Seq.empty
    }
  }
}
