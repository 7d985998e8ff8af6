package graft

import graft.sources.Tables
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.apache.spark.sql.{functions => F}

/** Fixture-drift canary (round-10, from the r9 verdict): the driver
  * regenerated `/root/testdata` between rounds and changed `events.ts`
  * from parquet TIMESTAMP(NANOS)/int64 to TIMESTAMP(MICROS). The
  * engine's old pinned-encoding read surfaced that as 25 scattered
  * CAST stack traces plus a silently 1000×-compressed streaming
  * timeline. This suite turns the same class of break into ONE failing
  * test with a message that names the physical encoding found, so the
  * first diagnosis step is already done.
  */
class FixtureSpec extends SparkSpec {

  test("events.ts physical encoding is adaptively read to a logical timestamp") {
    val physical = spark.read.parquet(Tables.path(sf, "events"))
      .schema("ts").dataType
    val logical = Tables.scan(spark, sf, "events").schema("ts").dataType
    assert(logical == TimestampNTZType || logical == TimestampType,
      s"events.ts loaded as $logical (physical encoding in the fixture: " +
        s"$physical) — Tables.scan's adaptive read no longer normalizes " +
        "this encoding; update Dates.adaptiveTsToNtz")
  }

  test("every catalog table scans to a type-compatible logical schema") {
    // broad drift canary: if the driver regenerates a fixture with a
    // different physical encoding, the adaptive reads must still land
    // every column in the declared type FAMILY. Storage width is
    // deliberately mirrored (an int32 key scans as int32 — zero-copy
    // by design), so this checks family, not exact type; the case
    // that matters is a timestamp column regressing to raw longs or
    // strings. One readable failure naming both sides, instead of
    // deep CAST traces in whatever query touches the column first.
    import org.apache.spark.sql.types._
    def family(dt: DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case FloatType | DoubleType | _: DecimalType => "fractional"
      case StringType => "string"
      case TimestampType | TimestampNTZType => "timestamp"
      case BooleanType => "boolean"
      case BinaryType => "binary"
      case ArrayType(e, _) => s"array<${family(e)}>"
      case other => other.typeName
    }
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val declared = graft.schema.Catalog(t).structType
        .map(f => f.name -> f.dataType).toMap
      val scanned = Tables.scan(spark, sf, t).schema
        .map(f => f.name -> f.dataType).toMap
      for ((name, want) <- declared) {
        val got = scanned.getOrElse(name, sys.error(
          s"$t.$name missing from scan (fixture drift?)"))
        assert(family(got) == family(want),
          s"$t.$name scans as $got (family ${family(got)}) but the " +
            s"catalog declares $want (family ${family(want)}) — " +
            "fixture encoding drifted past the adaptive read")
      }
    }
  }

  test("events.ts spans the full fixture timeline (no unit-confusion compression)") {
    // a ns-read-as-µs (or µs-read-as-ns) mistake compresses/stretches
    // the 30-day event span by 1000× — it does NOT error, it just
    // produces plausible wrong windows. Assert the decoded span is
    // over a day so unit confusion fails here, loudly, instead.
    val physical = spark.read.parquet(Tables.path(sf, "events"))
      .schema("ts").dataType
    val row = Tables.scan(spark, sf, "events")
      .agg(F.min("ts").as("lo"), F.max("ts").as("hi"),
        (F.unix_micros(F.max("ts").cast("timestamp")) -
          F.unix_micros(F.min("ts").cast("timestamp"))).as("span_us"))
      .collect().head
    val spanUs = row.getAs[Long]("span_us")
    assert(spanUs > 24L * 3600 * 1000000,
      s"events.ts span is only ${spanUs / 1000000.0} s (${row.get(0)} .. " +
        s"${row.get(1)}; physical encoding in the fixture: $physical) — " +
        "the decoded timeline collapsed, which is the signature of a " +
        "ns/µs unit confusion in the storage→logical read")
    // and the decoded instants must land in the fixture's era, not 1970
    assert(row.get(0).toString.startsWith("20"),
      s"events.ts min decoded to ${row.get(0)} (physical: $physical) — " +
        "epoch-relative decode is off by a unit factor")
  }

  test("every declared timestamp column decodes into the fixture's era") {
    // round-11 advice: the events.ts span canary above guards ONE
    // column; any other table gaining a unit-confused timestamp read
    // (e.g. a fixture regenerated with plain int64 epoch-micros that
    // the nanos branch divides by 1000) had no guard. Sweep every
    // declared FTimestamp field of every catalog table: the decoded
    // min/max must land in a plausible era, not at ~1970 (unit too
    // small) or far future (unit too large). TPC-H dates are 1992-1998
    // and the event fixture is 2024 — [1990, 2100] covers both with
    // margin while catching every 1000× unit slip.
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val tsCols = graft.schema.Catalog(t).fields
        .filter(_.ftype.isInstanceOf[graft.schema.FTimestamp]).map(_.name)
      if (tsCols.nonEmpty) {
        val aggs = tsCols.flatMap(c => Seq(
          F.year(F.min(c).cast("timestamp")).as(s"${c}__lo"),
          F.year(F.max(c).cast("timestamp")).as(s"${c}__hi")))
        val row = Tables.scan(spark, sf, t).agg(aggs.head, aggs.tail: _*)
          .collect().head
        for (c <- tsCols; side <- Seq("lo", "hi")) {
          val y = row.getAs[Int](s"${c}__$side")
          assert(y >= 1990 && y <= 2100,
            s"$t.$c decodes to year $y — outside the fixture era " +
              "[1990, 2100]; storage→logical unit confusion " +
              "(see Dates.adaptiveTsToNtz)")
        }
      }
    }
  }
}
