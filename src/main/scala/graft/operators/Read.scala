package graft.operators

import graft.schema.{Catalog, TableDef}
import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}

/** Read-side operators (SURVEY §2.1-§2.5): query-by-example
  * filtering, declared sort, limit, two-column distinct projection,
  * count-over-subquery, uniqueness probe.
  *
  * All are thin declarative layers over DataFrame — Catalyst collapses
  * them into pruned, pushed-down parquet scans; nothing here forces a
  * shuffle except the global sort (which the reference mandates via
  * `meta->sorting`, `model.php:1158-1161`).
  */
object Read {

  import graft.sources.Tables

  /** P3 — conjunctive equality predicate from a query-by-example map
    * (`model.php:1269-1287`): WHERE col = v for every populated entry.
    * NULL values become IS NULL (SQL-correct, unlike `=` on NULL). */
  def qbe(t: TableDef, example: Map[String, Any]): Column =
    example.map { case (name, v) =>
      val f = t.field(name) // throws on undeclared, model.php:219-225
      if (v == null) F.col(f.name).isNull else F.col(f.name) === F.lit(v)
    }.reduceOption(_ && _).getOrElse(F.lit(true))

  /** S2/S3 — read: scan + QBE filter + declared sort + optional limit
    * (`model.php:723-758` via `query_select`, `model.php:1138-1173`).
    * limit=Some(1) is the point-lookup form. */
  def read(spark: SparkSession, sfDir: String, table: String,
           example: Map[String, Any] = Map.empty,
           extra: Option[Column] = None,
           limit: Option[Int] = None,
           sorted: Boolean = true): DataFrame = {
    val t = Catalog(table)
    var df = Tables.scan(spark, sfDir, table).filter(qbe(t, example))
    extra.foreach(p => df = df.filter(p)) // P4 arbitrary predicate passthrough
    if (sorted && t.sorting.nonEmpty) df = df.orderBy(t.sortColumns: _*) // O1
    limit.fold(df)(df.limit) // O3 — sort+limit plans as TakeOrderedAndProject
  }

  /** P2/O4/O5 — select_list: DISTINCT two-column projection
    * (`model.php:1038-1083`), the reference's key→value dictionary. */
  def selectList(spark: SparkSession, sfDir: String, table: String,
                 key: String, value: String): DataFrame =
    Tables.scan(spark, sfDir, table).select(key, value).distinct()

  /** O5 — materialized dictionary (driver-side; small results only,
    * `model.php:1074-1082`). The small-result contract is ENFORCED,
    * not just documented (same discipline as `Similarity.ivfTopK`'s
    * query collect): the limit() bounds the collect itself — at most
    * maxDriverRows+1 rows ever reach the driver, pushed into the
    * scan as a plan limit — so a huge table fails fast with a clear
    * message instead of silently OOMing the driver at scale. */
  def selectMap(spark: SparkSession, sfDir: String, table: String,
                key: String, value: String,
                maxDriverRows: Int = 100000): Map[String, String] = {
    val rows = selectList(spark, sfDir, table, key, value)
      .limit(maxDriverRows + 1).collect()
    require(rows.length <= maxDriverRows,
      s"selectMap result exceeds maxDriverRows=$maxDriverRows rows: the " +
        "keyed-dictionary form collects to the driver by contract. Use " +
        "selectList (distributed) for large results, or raise " +
        "maxDriverRows explicitly if the driver can hold it.")
    rows.map(r => String.valueOf(r.get(0)) -> String.valueOf(r.get(1))).toMap
  }

  /** A1 — total(): COUNT(*) over the QBE-filtered subquery
    * (`model.php:896-921`). Returned as a one-row frame so it can be
    * oracled; Catalyst collapses the subquery. */
  def total(spark: SparkSession, sfDir: String, table: String,
            example: Map[String, Any] = Map.empty,
            extra: Option[Column] = None): DataFrame = {
    val t = Catalog(table)
    var df = Tables.scan(spark, sfDir, table).filter(qbe(t, example))
    extra.foreach(p => df = df.filter(p))
    df.agg(F.count(F.lit(1)).as("total"))
  }

  /** A2 — is_unique probe (`meta.php:97-117`): TRUE when no row holds
    * the value. Uses limit(1) under the hood — no full count. */
  def isUnique(spark: SparkSession, sfDir: String, table: String,
               fieldName: String, value: Any): Boolean = {
    val t = Catalog(table)
    t.field(fieldName) // declared-field check
    Tables.scan(spark, sfDir, table)
      .filter(F.col(fieldName) === F.lit(value)).limit(1).isEmpty
  }
}
