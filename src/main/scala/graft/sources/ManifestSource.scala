package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider, SchemaRelationProvider}
import org.apache.spark.sql.types.StructType

/** `USING graft-manifest` — the DataSource V1 provider that lets
  * [[graft.operators.ManifestTable]] roots live in a PERSISTENT
  * catalog (Hive metastore): the catalog entry stores only the
  * provider name and the table root; every session that resolves it
  * gets a fresh [[ManifestSql.ManifestWritableRelation]] pinned to
  * the table's then-current head — pruned, snapshot-isolated,
  * SQL-insertable, across JVM restarts.
  *
  * Options:
  *  - `path` (required): the manifest table root;
  *  - `versionAsOf` (optional, ad-hoc reads only): pin a published
  *    version. Persistent entries never carry it — time travel is a
  *    session-level pin, not a catalog identity.
  *
  * Catalog-resolved reads arrive through the
  * [[SchemaRelationProvider]] arm (Spark passes the schema stored at
  * registration): a table whose recorded schema has since evolved
  * fails LOUDLY with a re-register instruction instead of serving the
  * stale projection — the same pin contract as
  * `ManifestFileIndex.refresh`. Nullability-only drift is tolerated
  * (every recorded field is nullable by construction). */
final class ManifestSource extends RelationProvider
  with SchemaRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest requires a 'path' option (the manifest table root)"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String])
      : BaseRelation =
    ManifestSql.baseRelation(sqlContext.sparkSession,
      rootOf(parameters), parameters.get("versionAsOf").map(_.trim.toInt))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String],
                              schema: StructType): BaseRelation = {
    val rel = createRelation(sqlContext, parameters)
    require(rel.schema.fieldNames.toSeq == schema.fieldNames.toSeq &&
      rel.schema.fields.map(_.dataType).toSeq ==
        schema.fields.map(_.dataType).toSeq,
      s"manifest table at ${rootOf(parameters)} has evolved since its " +
        "catalog registration (registered " +
        s"${schema.simpleString}, current ${rel.schema.simpleString}) — " +
        "re-register the catalog entry to pick up the new projection")
    rel
  }
}
