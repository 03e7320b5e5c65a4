package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {

  test("sessionize: 30-min gap rule with crafted timeline") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 7L),
      (2L, "2024-01-01 00:10:00", 7L), // +10min — same session
      (3L, "2024-01-01 00:50:00", 7L), // +40min — new session
      (4L, "2024-01-01 01:10:00", 7L), // +20min — same session
      (5L, "2024-01-01 00:05:00", 9L)  // other user
    ).toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.sessionize(df).orderBy("event_id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("sessions: per-session bounds/count/duration on the crafted " +
      "timeline; no second Exchange above the sessionize window") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 7L),
      (2L, "2024-01-01 00:10:00", 7L),
      (3L, "2024-01-01 00:50:00", 7L),
      (4L, "2024-01-01 01:10:00", 7L),
      (5L, "2024-01-01 00:05:00", 9L)
    ).toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.sessions(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getTimestamp(2).toString, r.getTimestamp(3).toString,
          r.getLong(4), r.getLong(5))).toMap
    assert(out((7L, 1L)) ==
      (("2024-01-01 00:00:00.0", "2024-01-01 00:10:00.0", 2L, 600L)))
    assert(out((7L, 2L)) ==
      (("2024-01-01 00:50:00.0", "2024-01-01 01:10:00.0", 2L, 1200L)))
    assert(out((9L, 1L)) ==
      (("2024-01-01 00:05:00.0", "2024-01-01 00:05:00.0", 1L, 0L)))
    // the (user, session) groupBy is satisfied by the window's
    // user_id hash partitioning: exactly ONE Exchange in the plan
    val plan = Events.sessions(df).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(1500))
  }

  test("transitions: crafted chains counted with __end__ terminators") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "view", "2024-01-01 09:00:00", 1L),
      (2L, "click", "2024-01-01 09:05:00", 1L),
      (3L, "view", "2024-01-01 09:10:00", 1L),
      (4L, "view", "2024-01-01 09:00:00", 2L),
      (5L, "click", "2024-01-01 09:01:00", 2L)
    ).toDF("event_id", "event_type", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.transitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("view", "click") -> 2L, ("click", "view") -> 1L,
      ("view", "__end__") -> 1L, ("click", "__end__") -> 1L))
  }

  test("volumeAnomaly: planted spike flagged; single-day type unflagged " +
      "with null z") {
    val s = spark
    import s.implicits._
    // type A: 29 quiet days of 10 events + one 500-event spike (a
    // single outlier among n days caps at z = (n-1)/sqrt(n), so n must
    // be large enough for the spike to clear 3 — here z ≈ 5.3);
    // type B: a single day (sigma undefined)
    val rows =
      (for (d <- 1 to 29; i <- 1 to 10) yield
        (s"a$d$i", "A", f"2024-01-$d%02d 10:00:00")) ++
      (1 to 500).map(i => (s"sp$i", "A", "2024-01-30 10:00:00")) ++
      Seq(("b1", "B", "2024-01-01 10:00:00"))
    val df = rows.zipWithIndex
      .map { case ((_, t, ts), i) => (i.toLong, t, ts, i.toLong % 7) }
      .toDF("event_id", "event_type", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.volumeAnomaly(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getInt(4))).toMap
    assert(out(("A", "2024-01-30"))._3 == 1) // spike flagged
    assert(out(("A", "2024-01-01"))._3 == 0) // quiet day not
    val b = out(("B", "2024-01-01"))
    assert(b._2.isEmpty && b._3 == 0) // single day: null z, unflagged
  }

  test("sequenceFunnel: 3-step chain on a crafted timeline — ordering " +
      "enforced, partial depths, horizon cut") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // user 1: view 09:00 → click 10:00 → purchase 10:30: depth 3, converted
      (1L, "view", "2024-01-01 09:00:00", 1L),
      (2L, "click", "2024-01-01 10:00:00", 1L),
      (3L, "purchase", "2024-01-01 10:30:00", 1L),
      // user 2: click BEFORE the first view must not count; no click
      // after the view → depth 1 (purchase after view can't chain
      // without a qualifying click)
      (4L, "click", "2024-01-01 08:00:00", 2L),
      (5L, "view", "2024-01-01 09:00:00", 2L),
      (6L, "purchase", "2024-01-01 10:00:00", 2L),
      // user 3: full chain but purchase 2 days later → depth 3, NOT converted
      (7L, "view", "2024-01-01 09:00:00", 3L),
      (8L, "click", "2024-01-01 09:30:00", 3L),
      (9L, "purchase", "2024-01-03 10:00:00", 3L),
      // user 4: never viewed → absent from the funnel entirely
      (10L, "click", "2024-01-01 09:00:00", 4L)
    ).toDF("event_id", "event_type", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.sequenceFunnel(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5))).toMap
    assert(out(1L) == ((3, 1)))
    assert(out(2L) == ((1, 0)))
    assert(out(3L) == ((3, 0)))
    assert(!out.contains(4L))
  }

  test("funnel: crafted timeline — converted, late, never, pre-click purchase") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // user 1: click 10:00, purchase 10:30 → converted
      (1L, "click", "2024-01-01 10:00:00", 1L),
      (2L, "purchase", "2024-01-01 10:30:00", 1L),
      // user 2: click 10:00, purchase 12:00 → found but NOT converted
      (3L, "click", "2024-01-01 10:00:00", 2L),
      (4L, "purchase", "2024-01-01 12:00:00", 2L),
      // user 3: click only → first_to null, not converted
      (5L, "click", "2024-01-01 09:00:00", 3L),
      // user 4: purchase BEFORE any click → excluded from the `to` min,
      // their later click counts, no qualifying purchase after it
      (6L, "purchase", "2024-01-01 08:00:00", 4L),
      (7L, "click", "2024-01-01 09:00:00", 4L),
      // user 5: no click at all → not in the funnel
      (8L, "purchase", "2024-01-01 10:00:00", 5L)
    ).toDF("event_id", "event_type", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.funnel(df)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(2)).map(_.toString), r.getInt(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((Some("2024-01-01 10:30:00.0"), 1)))
    assert(out(2L) == ((Some("2024-01-01 12:00:00.0"), 0)))
    assert(out(3L) == ((None, 0)))
    assert(out(4L) == ((None, 0)))
    // one Exchange end to end: the groupBy reuses the window's
    // user_id hash partitioning
    val plan = Events.funnel(df).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      plan.take(800))
  }

  test("retention: crafted cohorts — offsets, pre-signup exclusion, no-signup exclusion") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // user 1: signs up day 1, active days 1 and 3
      (1L, "signup", "2024-01-01 10:00:00", 1L),
      (2L, "click", "2024-01-01 12:00:00", 1L),
      (3L, "click", "2024-01-03 09:00:00", 1L),
      // user 2: same cohort day, active day 1 only; pre-signup event excluded
      (4L, "view", "2024-01-01 08:00:00", 2L),   // before signup, SAME day → offset 0 counts
      (5L, "signup", "2024-01-01 09:00:00", 2L),
      // user 3: never signs up → absent entirely
      (6L, "click", "2024-01-01 10:00:00", 3L),
      // user 4: cohort day 2, event on day 1 (before cohort DAY) dropped
      (7L, "click", "2024-01-01 10:00:00", 4L),
      (8L, "signup", "2024-01-02 10:00:00", 4L)
    ).toDF("event_id", "event_type", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.retention(df)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 2L, // users 1 and 2 active on cohort day
      ("2024-01-01", 2) -> 1L, // user 1 back on day 3
      ("2024-01-02", 0) -> 1L)) // user 4's signup itself
  }

  test("typePivot: explicit value list fixes the schema; absent combos are 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "click", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 11:00:00"),
      (3L, "view", "2024-01-01 12:00:00"),
      (4L, "purchase", "2024-01-02 10:00:00")
    ).toDF("event_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.typePivot(df).orderBy("day").collect()
    // all five columns exist even though only three types appear
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("day", "click", "view", "purchase", "signup", "error"))
    val d1 = out(0)
    assert(d1.getString(0) == "2024-01-01" && d1.getLong(1) == 2 &&
      d1.getLong(2) == 1 && d1.getLong(3) == 0 && d1.getLong(4) == 0)
    val d2 = out(1)
    assert(d2.getString(0) == "2024-01-02" && d2.getLong(3) == 1 &&
      d2.getLong(1) == 0)
  }

  test("cardinality: exact counts on a crafted day; approx within rsd bound") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "click", "2024-01-01 10:00:00", 7L),
      (2L, "click", "2024-01-01 11:00:00", 7L), // same user, same day
      (3L, "click", "2024-01-01 12:00:00", 9L),
      (4L, "click", "2024-01-02 10:00:00", 7L), // next day
      (5L, "view", "2024-01-01 10:30:00", 7L)
    ).toDF("event_id", "event_type", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.cardinality(df)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      ("click", "2024-01-01") -> ((3L, 2L)),
      ("click", "2024-01-02") -> ((1L, 1L)),
      ("view", "2024-01-01") -> ((1L, 1L))))

    // the HLL path stays inside its relative-error bound on real data
    val ev = graft.sources.Sources.eventsTable(spark, sf0001)
    val exact = Events.cardinality(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    val approx = Events.cardinality(ev, approx = true, rsd = 0.02)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(3.0, 0.1 * e),
        s"$k: exact=$e approx=$a")
    }
  }

  test("extractProps/propsAgg: JSON payload parsed and aggregated") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "click", """{"k": 10}"""),
      (2L, "click", """{"k": 20}"""),
      (3L, "view", """{"k": 7}"""),
      (4L, "view", "not json")
    ).toDF("event_id", "event_type", "props")
    val ext = Events.extractProps(df)
    assert(ext.filter(col("event_id") === 1L).head().getAs[Int]("k") == 10)
    assert(ext.filter(col("event_id") === 4L).head().isNullAt(
      ext.columns.indexOf("k"))) // malformed -> null, not a crash
    val agg = Events.propsAgg(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(agg("click") == (2L, 15.0))
    assert(agg("view")._1 == 2L)
  }

  test("asofJoin: latest right row at-or-before each left time, per key") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 7L, "2024-01-01 00:10:00"), // after r@00:05 -> 5.0
      (2L, 7L, "2024-01-01 00:20:00"), // after r@00:15 -> 15.0
      (3L, 7L, "2024-01-01 00:15:00"), // EQUAL ts -> inclusive, 15.0
      (4L, 7L, "2024-01-01 00:01:00"), // before any right -> null
      (5L, 9L, "2024-01-01 00:30:00")  // other key, no right rows -> null
    ).toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val right = Seq(
      (7L, "2024-01-01 00:05:00", 5.0),
      (7L, "2024-01-01 00:15:00", 15.0),
      (7L, "2024-01-01 00:15:00", 12.0), // tie on (key, ts): max wins
      (7L, "2024-01-01 00:25:00", 25.0)  // later than every left -> unused
    ).toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.asofJoin(left, right, Seq("user_id"), "ts", Seq("value"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("asof_value"))).toMap
    assert(out == Map(1L -> Some(5.0), 2L -> Some(15.0), 3L -> Some(15.0),
      4L -> None, 5L -> None))
  }

  test("asofJoin: tolerance nulls stale matches but keeps the row") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 7L, "2024-01-01 01:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val right = Seq((7L, "2024-01-01 00:00:00", 5.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val within = Events.asofJoin(left, right, Seq("user_id"), "ts",
      Seq("value"), toleranceSec = Some(3600L)).head()
    assert(within.getAs[Double]("asof_value") == 5.0)
    val stale = Events.asofJoin(left, right, Seq("user_id"), "ts",
      Seq("value"), toleranceSec = Some(3599L)).collect()
    assert(stale.length == 1 && stale.head.isNullAt(
      stale.head.fieldIndex("asof_value")))
  }

  test("asofJoin: single Exchange (one hash shuffle on the key)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 7L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((7L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val plan = Events.asofJoin(left, right, Seq("user_id"), "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    // ties collapse inside the window's own sort (no groupBy, whose
    // (key, time) partitioning would cost a second Exchange); no join
    // operator at all — the naive equi+range join shape would be a
    // per-key cross product at 100 TB
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash Exchange, plan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Aggregate"))
  }

  test("sessionize: exact-boundary gap (== gap) stays in session") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L),
      (2L, "2024-01-01 00:30:00", 1L) // exactly 1800s: not > gap
    ).toDF("event_id", "ts_s", "user_id")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.sessionize(df).select("session_idx")
      .collect().map(_.getLong(0))
    assert(out.toSet == Set(1L))
  }

  test("cardinalitySketch: split-sketch-merge == one-shot, parquet " +
      "round-trip preserves the estimate, gate holds vs exact") {
    val s = spark
    import s.implicits._
    // 2 types × overlapping user ranges; enough users that a broken
    // merge (double-count / drop) moves the estimate past the gate
    val df = (0L until 5000L).map { i =>
      (i, if (i % 3 == 0) "click" else "view", i % 1200L)
    }.toDF("event_id", "event_type", "user_id")
    val oneShot = Events.cardinalityEstimate(Events.cardinalitySketch(df))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val tmp = java.nio.file.Files.createTempDirectory("graft_hll_spec")
    try {
      val hist = Events.cardinalitySketch(df.filter($"event_id" % 2 === 0))
      hist.write.mode("overwrite").parquet(s"$tmp/sk")
      val merged = Events.cardinalityEstimate(Events.cardinalityMerge(
        s.read.parquet(s"$tmp/sk").unionByName(
          Events.cardinalitySketch(df.filter($"event_id" % 2 === 1)))))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      // merge over a parquet round-trip reproduces the one-shot sketch
      // exactly (same input union → same HLL registers → same estimate)
      assert(merged == oneShot, s"merged=$merged oneShot=$oneShot")
      val exact = df.groupBy("event_type")
        .agg(countDistinct($"user_id").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((t, (nEv, est)) <- merged) {
        assert(math.abs(est - exact(t)).toDouble <= 0.03 * exact(t),
          s"$t: est $est vs exact ${exact(t)}")
      }
      assert(merged.values.map(_._1).sum == 5000L) // volume leg exact
    } finally {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(del))
        f.delete(); ()
      }
      del(tmp.toFile)
    }
  }

  test("cardinalitySketch: sketch rows are KB-scale artifacts (state " +
      "bounded by lgK, not user count)") {
    val s = spark
    import s.implicits._
    val df = (0L until 20000L).map(i => (i, "view", i))
      .toDF("event_id", "event_type", "user_id")
    val row = Events.cardinalitySketch(df, lgK = 12).collect().head
    val bytes = row.getAs[Array[Byte]]("sk")
    // lgK=12 → ≤ 4096 registers (+header); 20k distinct users must not
    // inflate the artifact past the register ceiling
    assert(bytes.length <= 4096 + 64, s"sketch ${bytes.length} bytes")
  }

  /** Crafted journey stream: user 7 A,B,A,C; user 9 A,B; user 11 a
    * lone D. Edges A→B(2), B→A(1), A→C(1); W(A)=3, W(B)=1; C and D
    * have no out-edges, D no in-edges either. */
  private def prFixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "2024-01-01 00:00:00", 7L, "A"),
      (2L, "2024-01-01 00:01:00", 7L, "B"),
      (3L, "2024-01-01 00:02:00", 7L, "A"),
      (4L, "2024-01-01 00:03:00", 7L, "C"),
      (5L, "2024-01-01 00:00:00", 9L, "A"),
      (6L, "2024-01-01 00:01:00", 9L, "B"),
      (7L, "2024-01-01 00:00:00", 11L, "D")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
  }

  test("pageRank: 3 unrolled iterations match a serial reference on " +
      "the crafted graph; sourceless node pins to the reset mass") {
    val out = Events.pageRank(prFixture).collect()
      .map(r => r.getAs[String]("event_type") ->
        (1 to 3).map(t => r.getAs[Double](s"pr_$t")))
      .toMap
    // serial reference: the r16 FIXED-POINT formula — micro-rank
    // longs, per-edge floor contributions, integer mass — in plain
    // Scala
    val edges = Map(("A", "B") -> 2L, ("B", "A") -> 1L, ("A", "C") -> 1L)
    val w = Map("A" -> 3L, "B" -> 1L)
    var pri = Map("A" -> 1000000L, "B" -> 1000000L,
      "C" -> 1000000L, "D" -> 1000000L)
    val trace = (1 to 3).map { _ =>
      pri = pri.keys.map { v =>
        val mass = edges.collect {
          case ((u, d), n) if d == v =>
            math.floor(pri(u) * n / w(u).toDouble).toLong
        }.sum
        v -> math.floor(
          (0.15 + 0.85 * (mass / 1000000.0)) * 1000000.0 + 0.5).toLong
      }.toMap
      pri.map { case (k, v) => k -> v / 1000000.0 }
    }
    for (node <- Seq("A", "B", "C", "D"); t <- 1 to 3)
      assert(out(node)(t - 1) == trace(t - 1)(node),
        s"$node pr_$t: got ${out(node)(t - 1)}, want ${trace(t - 1)(node)}")
    // D receives nothing ever: rank == reset mass at every step
    assert(out("D") == Seq(0.15, 0.15, 0.15))
    // B keeps receiving A's dominant share: strictly above reset
    assert(out("B").forall(_ > 0.15))
  }

  test("pageRank: rank vector is partitioning-invariant") {
    val a = Events.pageRank(prFixture).orderBy("event_type").collect().toSeq
    val b = Events.pageRank(prFixture.repartition(7, col("event_id")))
      .orderBy("event_type").collect().toSeq
    assert(a == b)
  }

  test("rollingWindow: trailing 1h RANGE frame counts peers and " +
      "hand-checked sums; types never mix") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "a", 1.0),
      (2L, "2024-01-01 00:30:00", "a", 2.0),
      (3L, "2024-01-01 01:00:00", "a", 4.0),  // 00:00 still in frame
      (4L, "2024-01-01 01:00:00", "a", 8.0),  // peer of 3 — RANGE ties
      (5L, "2024-01-01 02:30:00", "a", 16.0), // everything expired
      (6L, "2024-01-01 00:45:00", "b", 100.0)
    ).toDF("event_id", "ts_s", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Events.rollingWindow(df).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_window"), r.getAs[Double]("sum_window"))).toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((2L, 3.0)))
    // RANGE peers: both 01:00 rows see each other plus 00:00/00:30
    assert(out(3L) == ((4L, 15.0)))
    assert(out(4L) == ((4L, 15.0)))
    assert(out(5L) == ((1L, 16.0)))
    assert(out(6L) == ((1L, 100.0)))
  }
}
