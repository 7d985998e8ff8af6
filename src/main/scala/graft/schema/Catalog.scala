package graft.schema

import org.apache.spark.sql.{functions => F}

/** The process-wide schema registry — Spark-side equivalent of the
  * reference's `Hive::$meta[$model]` singleton cache
  * (`classes/hive/model.php:14-16,69-79`): declare once, look up by
  * model name everywhere.
  *
  * The driver's test tables (FIXTURES.md §B) are pre-registered,
  * with relations instantiating the reference's relation algebra on
  * the TPC-H-ish star schema (FIXTURES.md "Relation mapping").
  */
object Catalog {

  private var defs: Map[String, TableDef] = Map.empty

  def register(t: TableDef): TableDef = synchronized { defs += t.name -> t; t }

  def apply(name: String): TableDef =
    defs.getOrElse(name, throw new IllegalArgumentException(
      s"unregistered table '$name' (have: ${defs.keys.mkString(", ")})"))

  def tables: Seq[String] = defs.keys.toSeq.sorted

  /** Names of declared fixed-cardinality dimensions (see
    * [[TableDef.broadcastDim]]). */
  def broadcastDims: Set[String] =
    defs.collect { case (n, t) if t.broadcastDim => n }.toSet

  // ---- driver parquet tables (FIXTURES.md §B) ----

  register(TableDef("region",
    fields = Seq(
      Field("r_regionkey", FInt, primary = true, nullable = false),
      Field("r_name", FStr)),
    sorting = Seq("r_regionkey" -> Asc),
    broadcastDim = true))

  register(TableDef("nation",
    fields = Seq(
      Field("n_nationkey", FInt, primary = true, nullable = false),
      Field("n_name", FStr),
      Field("n_regionkey", FInt)),
    sorting = Seq("n_nationkey" -> Asc),
    relations = Map(
      "region" -> BelongsTo("region", Seq("n_regionkey" -> "r_regionkey")),
      // has_one: remote-side FK, one deterministic child per parent
      // (reference reads the first child under the child's declared
      // sort, relation/hasone.php:13-36 + LIMIT 1)
      "first_customer" -> HasOne("customer", Seq("n_nationkey" -> "c_nationkey"))),
    broadcastDim = true))

  register(TableDef("customer",
    fields = Seq(
      Field("c_custkey", FAuto, primary = true, unique = true, nullable = false),
      Field("c_name", FStr, rules = Seq(NotEmpty, MinLength(5), MaxLength(127))),
      Field("c_nationkey", FInt),
      Field("c_acctbal", FFloat(2), rules = Seq(InRange(-1000.0, 10000.0))),
      Field("c_mktsegment", FEnum(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")),
        rules = Seq(InSet(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))))),
    sorting = Seq("c_custkey" -> Asc),
    relations = Map(
      "nation" -> BelongsTo("nation", Seq("c_nationkey" -> "n_nationkey")),
      "orders" -> HasMany("orders", Seq("c_custkey" -> "o_custkey")),
      // relation constant conditions (P5, relation.php:29-31)
      "open_orders" -> HasMany("orders", Seq("c_custkey" -> "o_custkey"),
        conditions = Map("o_orderstatus" -> "O"))),
    aliases = Map(
      // README.md:161-170 full_name-style computed column
      "c_label" -> (_ => F.trim(F.concat_ws(" ", F.col("c_name"), F.col("c_mktsegment")))))))

  // email + boolean field types end-to-end (reference README.md:42-49,
  // field/email.php, field/boolean.php:13-33): a second model over the
  // stored customer table (storage override) deriving a validated
  // email and a Yes/No boolean from existing physical columns.
  register(TableDef("customer_profile",
    storage = Some("customer"),
    fields = Seq(
      Field("c_custkey", FAuto, primary = true, unique = true, nullable = false),
      // deterministic synthetic email: names ending in 0/5 get a
      // TLD-less (invalid) address so EmailRule has both outcomes
      Field("c_email", FEmail, column = Some("c_name"),
        rules = Seq(NotEmpty, EmailRule),
        readExpr = Some((c, _) => F.concat(
          F.regexp_replace(F.lower(c), "[^a-z0-9]", ""),
          F.when(F.substring(c, -1, 1).isin("0", "5"), "@invalid")
            .otherwise("@example.com")))),
      Field("c_active", FBool, column = Some("c_acctbal"),
        readExpr = Some((c, _) => c > 0.0))),
    sorting = Seq("c_custkey" -> Asc)))

  register(TableDef("supplier",
    fields = Seq(
      Field("s_suppkey", FAuto, primary = true, unique = true, nullable = false),
      Field("s_name", FStr, rules = Seq(NotEmpty)),
      Field("s_nationkey", FInt),
      Field("s_acctbal", FFloat(2))),
    sorting = Seq("s_suppkey" -> Asc),
    relations = Map(
      "nation" -> BelongsTo("nation", Seq("s_nationkey" -> "n_nationkey")))))

  register(TableDef("part",
    fields = Seq(
      Field("p_partkey", FAuto, primary = true, unique = true, nullable = false),
      Field("p_name", FStr),
      Field("p_brand", FStr),
      Field("p_type", FStr),
      Field("p_size", FInt),
      Field("p_retailprice", FFloat(2))),
    sorting = Seq("p_partkey" -> Asc),
    relations = Map(
      // N:M — parts appear in orders through lineitem (the pivot)
      "orders" -> ManyToMany("orders", through = "lineitem",
        localKey = "p_partkey" -> "l_partkey",
        remoteKey = "l_orderkey" -> "o_orderkey"))))

  register(TableDef("orders",
    fields = Seq(
      Field("o_orderkey", FAuto, primary = true, unique = true, nullable = false),
      Field("o_custkey", FInt, nullable = false),
      Field("o_orderstatus", FEnum(Seq("F", "O", "P"))),
      Field("o_totalprice", FFloat(2)),
      Field("o_orderdate", FTimestamp(), autoNowCreate = true),
      Field("o_orderpriority", FStr)),
    sorting = Seq("o_orderdate" -> Desc, "o_orderkey" -> Asc),
    relations = Map(
      "customer" -> BelongsTo("customer", Seq("o_custkey" -> "c_custkey")),
      "lineitem" -> HasMany("lineitem", Seq("o_orderkey" -> "l_orderkey")))))

  register(TableDef("lineitem",
    fields = Seq(
      Field("l_orderkey", FInt, primary = true, nullable = false),
      Field("l_partkey", FInt, nullable = false),
      Field("l_suppkey", FInt, nullable = false),
      Field("l_linenumber", FInt, primary = true, nullable = false),
      Field("l_quantity", FFloat(2)),
      Field("l_extendedprice", FFloat(2)),
      Field("l_discount", FFloat(2)),
      Field("l_tax", FFloat(2)),
      Field("l_returnflag", FEnum(Seq("A", "N", "R"))),
      Field("l_linestatus", FEnum(Seq("F", "O"))),
      Field("l_shipdate", FTimestamp())),
    sorting = Seq("l_orderkey" -> Asc, "l_linenumber" -> Asc),
    relations = Map(
      "orders" -> BelongsTo("orders", Seq("l_orderkey" -> "o_orderkey")),
      "part" -> BelongsTo("part", Seq("l_partkey" -> "p_partkey")),
      "supplier" -> BelongsTo("supplier", Seq("l_suppkey" -> "s_suppkey")))))

  register(TableDef("events",
    fields = Seq(
      Field("event_id", FAuto, primary = true, unique = true, nullable = false),
      // physical encoding is whatever the fixture writer chose —
      // int64 epoch-nanos (TIMESTAMP(NANOS) under nanosAsLong) or
      // TIMESTAMP(MICROS); both have shipped. The adaptive read
      // normalizes either to logical TIMESTAMP_NTZ at micro
      // precision, matching how the DuckDB oracle sees the instants.
      Field("ts", FTimestamp("yyyy-MM-dd HH:mm:ss"), readExpr = Some(
        (c, dt) => graft.functions.Dates.adaptiveTsToNtz(c, dt))),
      Field("user_id", FInt),
      Field("event_type", FStr),
      Field("value", FFloat(4)),
      Field("props", FText)),
    sorting = Seq("event_id" -> Asc)))

  register(TableDef("documents",
    fields = Seq(
      Field("doc_id", FAuto, primary = true, unique = true, nullable = false),
      Field("text", FText, rules = Seq(NotEmpty)),
      Field("lang", FStr),
      Field("source", FStr),
      Field("n_chars", FInt)),
    sorting = Seq("doc_id" -> Asc)))

  register(TableDef("embeddings",
    fields = Seq(
      Field("vec_id", FAuto, primary = true, unique = true, nullable = false),
      Field("embedding", FVector),
      Field("label", FInt)),
    sorting = Seq("vec_id" -> Asc)))
}
