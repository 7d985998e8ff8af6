package graft

import graft.operators.{Read, Writes, Joins}
import graft.schema._
import graft.sources.Tables
import org.apache.spark.sql.{functions => F}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws (SURVEY §5.3): coercion semantics, QBE ≡
  * manual filter, merge row-count invariants, timestamp round-trip.
  * Data-driven through one DataFrame per property (not one job per
  * sample) to keep the suite fast. */
class PropertySpec extends SparkSpec {

  private def checkProp(p: Prop, n: Int = 5): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  import spark.implicits._

  test("coercion law: empty/blank -> NULL (nullable) or default") {
    val samples = Seq("", "   ", null, "42", "7", "-3", "0")
    val df = samples.toDF("raw")
    val nullable = df.select(FInt.coerce(F.col("raw")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(nullable.take(3).forall(_.isEmpty)) // empties -> NULL
    assert(nullable.drop(3).flatten.sameElements(Array(42L, 7L, -3L, 0L)))
    val defaulted = df.select(
      FInt.coerce(F.col("raw"), nullable = false, default = Some(99L)).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(defaulted.take(3).forall(_.contains(99L)))
  }

  test("coercion never throws under ANSI mode: garbage -> NULL/default") {
    val garbage = Seq("abc", "12x", "1.2.3", "½", "NaNbut", "--5", "0x1G", "∞")
    val df = garbage.toDF("raw")
    val types: Seq[(String, FieldType)] = Seq(
      "int" -> FInt, "float" -> FFloat(2), "bool" -> FBool, "ts" -> FTimestamp())
    types.foreach { case (label, t) =>
      val asNull = df.select(t.coerce(F.col("raw")).as("v")).collect()
      assert(asNull.forall(_.isNullAt(0)), s"$label: garbage must coerce to NULL")
      val withDefault = df.select(
        t.coerce(F.col("raw"), nullable = false, default = Some(0)).as("v")).collect()
      assert(withDefault.forall(r => !r.isNullAt(0)),
        s"$label: garbage must coerce to the default when not nullable")
    }
  }

  test("QBE filter ≡ manually composed predicate (any example subset)") {
    val t = Catalog("orders")
    val base = Tables.scan(spark, sf, "orders")
    val examples = Seq(
      Map[String, Any]("o_custkey" -> 7L),
      Map[String, Any]("o_orderstatus" -> "F"),
      Map[String, Any]("o_custkey" -> 7L, "o_orderstatus" -> "O"),
      Map[String, Any]())
    examples.foreach { ex =>
      val viaQbe = base.filter(Read.qbe(t, ex)).count()
      val manual = ex.foldLeft(base) { case (df, (c, v)) =>
        df.filter(F.col(c) === F.lit(v))
      }.count()
      assert(viaQbe == manual, s"example $ex")
    }
  }

  test("QBE NULL law: a null example selects exactly the IS NULL rows (never `= NULL`)") {
    // the reference maps a NULL example value to IS NULL (qbe,
    // Read.scala) — `=` on NULL would select NOTHING. The fixture has
    // no nullable column populated with NULLs, so synthesize them
    // into the declared events.props field and pin the law over
    // random example values including null.
    val t = Catalog("events")
    // small slice: the partition law below runs one qbe filter per
    // distinct props value
    val base = Tables.scan(spark, sf, "events").limit(40)
      .withColumn("props",
        F.when(F.col("event_id") % 3 === 0, F.lit(null).cast("string"))
          .otherwise(F.col("props")))
    val local = base.select("event_id", "props").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
    val present = local.collect { case (_, v) if v != null => v }.distinct
    assert(local.exists(_._2 == null) && present.nonEmpty)
    val values: Gen[Any] = Gen.oneOf[Any](null, present.head,
      present.last, "no-such-props-value")
    checkProp(Prop.forAllNoShrink(values) { v =>
      val got = base.filter(Read.qbe(t, Map("props" -> v)))
        .select("event_id").collect().map(_.getLong(0)).toSet
      val want = local.collect {
        case (id, pv) if (v == null && pv == null) ||
          (v != null && pv == v) => id
      }.toSet
      got == want
    }, n = 8)
    // partition law: IS NULL rows + all per-value rows tile the table
    val nullCount = base.filter(Read.qbe(t, Map("props" -> null))).count()
    val valueCounts = present.map(v =>
      base.filter(Read.qbe(t, Map("props" -> v))).count()).sum
    assert(nullCount > 0 && nullCount + valueCounts == base.count())
  }

  test("merge invariants: |upsert| = |base| + |new keys|; |delete| = |base| - |victims∩base|; update preserves count") {
    val base = Tables.scan(spark, sf, "orders")
    val n = base.count()
    checkProp(Prop.forAllNoShrink(Gen.choose(1L, 50L), Gen.choose(0L, 30L)) { (upTo, newN) =>
      val updates = base.filter(F.col("o_orderkey") <= upTo)
      val inserts = base.filter(F.col("o_orderkey") <= newN)
        .withColumn("o_orderkey", F.col("o_orderkey") + 1000000L)
      val nNew = inserts.count()
      val up = Writes.upsert(base, updates.unionByName(inserts), Seq("o_orderkey"))
      val del = Writes.delete(base, updates, Seq("o_orderkey"))
      val updEq = Writes.update(base,
        updates.select(F.col("o_orderkey"), F.lit("Z").as("o_orderpriority")),
        Seq("o_orderkey")).count() == n
      (up.count() == n + nNew) && (del.count() == n - updates.count()) && updEq
    })
  }

  test("LIMIT-n DML: at most n rows change, and they are the first n by pk") {
    // reference update()/delete() take a LIMIT clause (model.php:775,
    // 831, default $limit = 1) — rows changed ≤ n, chosen by pk order
    val base = Tables.scan(spark, sf, "orders")
    val n = base.count()
    checkProp(Prop.forAllNoShrink(Gen.choose(1, 8)) { lim =>
      val victims = base.filter(F.col("o_orderstatus") === "F")
      val firstByPk = victims.orderBy(F.col("o_orderkey").asc).limit(lim)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      val deleted = Writes.delete(base, victims, Seq("o_orderkey"),
        limit = Some(lim))
      val survivorKeys = deleted.select("o_orderkey").collect()
        .map(_.getLong(0)).toSet
      val delOk = (n - deleted.count()) <= lim &&
        firstByPk.forall(k => !survivorKeys.contains(k))
      val delta = victims.select(F.col("o_orderkey"),
        F.lit("9-TEST").as("o_orderpriority"))
      val changed = Writes.update(base, delta, Seq("o_orderkey"),
        limit = Some(lim))
        .filter(F.col("o_orderpriority") === "9-TEST")
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      delOk && changed.size <= lim && changed == firstByPk
    }, n = 3)
  }

  test("timestamp verbose/parse round-trip at date precision") {
    val t = FTimestamp("MM/dd/yyyy")
    val df = Tables.scan(spark, sf, "orders").limit(50)
      .select(F.col("o_orderdate").as("ts"))
    val round = df.select(
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").as("expect"),
        FTimestamp.lenientParse(t.verbose(F.col("ts"))).cast("timestamp_ntz").as("got"))
      .filter(F.col("expect") =!= F.col("got")).count()
    assert(round == 0)
  }

  test("salted join equals plain join") {
    val orders = Tables.scan(spark, sf, "orders")
    val cust = Tables.scan(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, Seq("o_custkey"), "inner").count()
    val salted = Joins.saltedJoin(orders, cust, Seq("o_custkey"), 8).count()
    assert(plain == salted)
  }

  test("salted agg law: equals plain groupBy on random skewed data") {
    val rows = Gen.listOfN(60, for {
      key <- Gen.frequency(4 -> Gen.const(1L), 1 -> Gen.choose(2L, 5L))
      value <- Gen.choose(-100.0, 100.0)
    } yield (key, value))
    checkProp(Prop.forAll(rows) { data =>
      data.isEmpty || {
        val df = data.zipWithIndex
          .map { case ((k, v), i) => (i.toLong, k, v) }
          .toDF("row_id", "key", "value")
        val plain = df.groupBy("key")
          .agg(F.count(F.lit(1)).as("n"), F.min("value").as("mn"),
            F.max("value").as("mx"))
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
        val salted = graft.operators.Skew
          .saltedAgg(df, "key", F.col("row_id"), "value", buckets = 4)
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
        salted == plain
      }
    }, n = 3)
  }

  test("fuzzy-pairs law: blocked join equals brute-force prefix Levenshtein") {
    // reference edit distance (classic DP) over the operator's exact
    // candidate contract: same block prefix AND prefix distance ≤ d
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val texts = Gen.listOfN(12, for {
      base <- Gen.oneOf("the quick brown fox", "lorem ipsum dolor",
        "pack my box with jugs")
      noise <- Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString)
      pad <- Gen.oneOf("", "  ", " extra words here")
    } yield s"$base $noise$pad")
    checkProp(Prop.forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .fuzzyPairs(df, "doc_id", "text", blockLen = 8, prefixLen = 16, maxDist = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, i) <- ts.zipWithIndex; (b, j) <- ts.zipWithIndex if i < j
        na = norm(a); nb = norm(b)
        if na.take(8) == nb.take(8)
        dist = lev(na.take(16), nb.take(16)) if dist <= 3
      } yield (i.toLong, j.toLong, dist.toLong)).toSet
      got == want
    }, n = 4)
  }

  test("containment law: df-capped inverted join equals brute-force set containment") {
    // reference: distinct word-trigram shingles per doc (the exact
    // Text.distinctShingles semantics: < 3 tokens → one whole-text
    // shingle), containment = |A∩B| / min(|A|,|B|). With dfCap >
    // corpus size the cap never drops a blocking term, so the blocked
    // join must equal brute force EXACTLY — same pairs, same doubles.
    def sh3(s: String): Set[String] = {
      val t = s.toLowerCase.split("\\s+").toSeq
      if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
      else Set(t.mkString(" "))
    }
    val texts = Gen.listOfN(10, for {
      base <- Gen.oneOf("the quick brown fox jumps over dogs",
        "lorem ipsum dolor sit amet words", "pack my box with five jugs")
      tail <- Gen.oneOf("", " and then some trailing words appear",
        " extra tail")
    } yield base + tail)
    checkProp(Prop.forAll(texts) { ts =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .containmentPairs(df, "doc_id", "text", threshold = 0.6, dfCap = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = (for {
        (a, i) <- ts.zipWithIndex; (b, j) <- ts.zipWithIndex if i < j
        sa = sh3(a); sb = sh3(b)
        inter = (sa & sb).size if inter > 0
        cont = inter.toDouble / math.min(sa.size, sb.size) if cont >= 0.6
      } yield (i.toLong, j.toLong, cont)).toSet
      got == want
    }, n = 4)
  }

  test("as-of law: window formulation equals brute-force per-probe scan") {
    import java.sql.Timestamp
    val rows = for {
      nb <- Gen.choose(1, 8); np <- Gen.choose(1, 8)
      build <- Gen.listOfN(nb, for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 50L)
        v <- Gen.option(Gen.choose(0.0, 9.0))
      } yield (k, t, v))
      probe <- Gen.listOfN(np, for {
        k <- Gen.choose(1L, 3L); t <- Gen.choose(0L, 50L)
      } yield (k, t))
    } yield (build, probe)
    checkProp(Prop.forAll(rows) { case (build, probe) =>
      def ts(s: Long) = new Timestamp(s * 1000L)
      val bDf = build.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("user_id", "ts", "value")
      val pDf = probe.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("event_id", "user_id", "ts")
      // reference: reduce build to (key, ts) -> max value (None only
      // when every value at that ts is None), then latest at-or-before
      val reduced = build.groupBy(b => (b._1, b._2)).map { case ((k, t), g) =>
        (k, t) -> g.flatMap(_._3).maxOption
      }
      val expect = probe.zipWithIndex.map { case ((k, t), i) =>
        val cands = reduced.filter { case ((bk, bt), _) => bk == k && bt <= t }
        i.toLong -> cands.toSeq.sortBy(_._1._2).lastOption
          .map { case ((_, bt), v) => (Some(bt), v) }
          .getOrElse((None, None))
      }.toMap
      val got = graft.operators.Temporal
        .asofJoin(pDf, bDf, "user_id", "ts", "value", prefix = "p")
        .collect().map { r =>
          // output columns: user_id, ts, event_id (extra), p_ts, p_value
          r.getLong(2) -> ((
            if (r.isNullAt(3)) None else Some(r.getTimestamp(3).getTime / 1000L),
            if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        }.toMap
      got == expect
    }, n = 5)
  }

  test("components law: min-label propagation equals union-find") {
    val edges = Gen.listOfN(12, for {
      a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    checkProp(Prop.forAll(edges) { es =>
      es.isEmpty || {
        val pairs = es.toDF("id_a", "id_b")
        val got = graft.operators.Dedup.dupComponents(pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
        // canonical label = min node id per root group
        val byRoot = nodes.groupBy(find)
        val expect = byRoot.flatMap { case (_, ns) =>
          val m = ns.min; ns.map(_ -> m)
        }.toMap
        got == expect
      }
    }, n = 5)
  }

  test("incremental-components law: folding any batch split equals the full recompute") {
    // random small graphs, random old/new edge split — the meta-graph
    // fold must be row-identical to CC over the union, including
    // batches that bridge old components, touch only new nodes, or
    // are empty
    val gen = for {
      edges <- Gen.listOfN(12, for {
        a <- Gen.choose(0L, 9L); b <- Gen.choose(0L, 9L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
      mask <- Gen.listOfN(12, Gen.oneOf(true, false))
    } yield (edges, mask)
    checkProp(Prop.forAll(gen) { case (edges, mask) =>
      val all = edges.toDF("id_a", "id_b")
      val old = edges.zip(mask).collect { case (e, false) => e }
      val batch = edges.zip(mask).collect { case (e, true) => e }
      val full = graft.operators.Dedup.dupComponents(all).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val labels0 = graft.operators.Dedup.dupComponents(
        old.toDF("id_a", "id_b"))
      val inc = graft.operators.Dedup.dupComponentsIncremental(
          labels0, batch.toDF("id_a", "id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      inc == full
    }, n = 4)
  }

  test("interval-join law: grid-bucketed join equals brute-force overlap, each pair exactly once") {
    // random variable-length intervals on a small key space; the law
    // checks BOTH set equality against the O(n²) reference AND
    // multiplicity 1 (the first-shared-cell dedup can neither drop a
    // pair nor emit it twice), across bucket widths smaller than,
    // comparable to, and larger than the interval lengths. len = 0
    // (an empty half-open interval) is generated deliberately: it
    // overlaps NOTHING — the brute-force reference requires sa < eb
    // AND sb < ea, both strict — and the operator must not emit
    // spurious overlap_us = 0 pairs for an empty interval sitting
    // strictly inside another.
    val gen = Gen.listOfN(14, for {
      key <- Gen.choose(0L, 2L)
      start <- Gen.choose(0L, 5000L)
      len <- Gen.choose(0L, 2500L)
    } yield (key, start, start + len))
    checkProp(Prop.forAll(gen) { iv =>
      val rows = iv.zipWithIndex.map { case ((k, s0, e0), i) =>
        (i.toLong, k,
          new java.sql.Timestamp(s0 * 1000L), new java.sql.Timestamp(e0 * 1000L))
      }
      val a = rows.toDF("a_id", "k", "a_start", "a_end")
      val b = rows.map { case (i, k, s0, e0) => (i, k, s0, e0) }
        .toDF("b_id", "k", "b_start", "b_end")
      val want = (for {
        ((ka, sa, ea), i) <- iv.zipWithIndex
        ((kb, sb, eb), j) <- iv.zipWithIndex
        if ka == kb && sa < eb && sb < ea
      } yield (i.toLong, j.toLong, (math.min(ea, eb) - math.max(sa, sb)) * 1000000L))
        .toSet
      Seq(7L, 600L, 100000L).forall { w =>
        val out = graft.operators.Temporal
          .intervalJoin(a, b, "k", "a_start", "a_end", "b_start", "b_end", w)
          .select("a_id", "b_id", "overlap_us")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        out.length == out.toSet.size && out.toSet == want
      }
    }, n = 4)
  }
}
