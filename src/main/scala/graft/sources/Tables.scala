package graft.sources

import graft.schema.{Catalog, TableDef}
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Table scans (SURVEY §2.1 S1): SELECT the declared fields, aliased
  * from their physical columns, FROM the model's table
  * (`model.php:1138-1173` + `meta.php:150-177`).
  *
  * The projection is declarative, so Catalyst pushes column pruning
  * and any later filters into the parquet reader (check
  * `PushedFilters`/`ReadSchema` in .explain). No casts are applied on
  * scan — declared types mirror storage, keeping the scan zero-copy
  * and schema-identical to the oracle's view of the same files.
  */
object Tables {

  /** Physical path of a table under a scale-factor directory. */
  def path(sfDir: String, table: String): String = s"$sfDir/$table.parquet"

  /** S1: full declared-field scan with physical→logical aliasing.
    * Fields with a `readExpr` get their storage→logical transform
    * applied inline (still one pruned parquet scan). */
  def scan(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // a TIMESTAMP(NANOS)-encoded file is only readable in Spark 4 as
    // int64 under this legacy flag; harmless for µs/ms encodings
    // (they load as their natural timestamp types). Runtime-settable,
    // idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = Catalog(table)
    val raw = spark.read.parquet(path(sfDir, t.storageName))
    raw.select(t.fields.map { f =>
      val base = F.col(f.physical)
      val phys = raw.schema(f.physical).dataType
      // readExpr sees the type the file ACTUALLY loaded as, so the
      // storage→logical transform adapts to the writer's encoding;
      // declared-timestamp fields WITHOUT a readExpr self-heal too —
      // if the fixture ever ships them as int64 epoch-nanos (the
      // encoding events.ts once used) the scan decodes instead of
      // surfacing longs into every downstream date expression
      val read = f.readExpr.map(fn => fn(base, phys)).getOrElse(
        f.ftype match {
          case _: graft.schema.FTimestamp
              if phys == org.apache.spark.sql.types.LongType =>
            graft.functions.Dates.adaptiveTsToNtz(base, phys)
          case _ => base
        })
      read.alias(f.name)
    }: _*)
  }

  /** Scan with computed alias columns materialized
    * (`model.php:199-206`): each alias is appended as a named column
    * over the declared projection. */
  def scanWithAliases(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val t = Catalog(table)
    t.aliases.foldLeft(scan(spark, sfDir, table)) {
      case (df, (name, expr)) => df.withColumn(name, expr(F.col(name)))
    }
  }

  def tableDef(table: String): TableDef = Catalog(table)

  /** Bucketed materialization for co-located joins (scale path): two
    * tables bucketed+sorted on their join key with the same bucket
    * count sort-merge-join WITHOUT a shuffle — at 100 TB this turns
    * every repeated fact↔fact join on the declared keys into a local
    * merge. Requires saveAsTable (bucket metadata lives in the
    * catalog). */
  def writeBucketed(df: DataFrame, catalogTable: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    // idempotent across SESSIONS, not just runs: the in-memory catalog
    // of a fresh session has no record of a previous session's managed
    // table, so a stale warehouse directory alone makes saveAsTable
    // throw LOCATION_ALREADY_EXISTS — drop the entry AND clear the dir
    spark.sql(s"DROP TABLE IF EXISTS `$catalogTable`")
    // resolve the managed-table location through the session catalog
    // (honors the current database and qualified names) instead of
    // guessing <warehouse>/<name> — the guess misses under `USE db`
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(catalogTable)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(catalogTable)
  }
}
