package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC merge semantics + the single-shuffle plan shape. */
class MergeSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    val target = Seq(
      (1L, "alpha", "s"), (2L, "beta", "s"), (3L, "gamma", "t"))
      .toDF("id", "text", "src")
    val updates = Seq(
      (2L, "BETA-v2", "s", false), // replace
      (4L, "delta", "u", false),   // insert
      (3L, "gamma", "t", true)     // delete
    ).toDF("id", "text", "src", "del")
    (target, updates)
  }

  test("upsert: updates replace, new keys insert, deletes drop") {
    val (target, updates) = fixture
    val out = Merge.upsert(target, updates, "id", Some("del"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "alpha", 2L -> "BETA-v2", 4L -> "delta"))
  }

  test("upsert without a delete column is pure upsert") {
    val (target, updates) = fixture
    val out = Merge.upsert(target, updates.drop("del"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the delete row degrades to a no-op replace with identical values
    assert(out === Map(
      1L -> "alpha", 2L -> "BETA-v2", 3L -> "gamma", 4L -> "delta"))
  }

  test("upsert preserves the target schema (tags dropped)") {
    val (target, updates) = fixture
    val out = Merge.upsert(target, updates, "id", Some("del"))
    assert(out.columns.toSeq === Seq("id", "text", "src"))
  }

  test("upsertStrict rejects duplicate source keys, accepts unique") {
    val (target, updates) = fixture
    val dup = updates.unionByName(
      updates.filter(col("id") === 2L))
    val e = intercept[IllegalArgumentException] {
      Merge.upsertStrict(target, dup, "id", Some("del"))
    }
    assert(e.getMessage.contains("duplicate"))
    // the clean batch passes the check and merges normally
    assert(Merge.upsertStrict(target, updates, "id", Some("del"))
      .count() === 3L)
  }

  test("plan: one Exchange, map-side WindowGroupLimit") {
    val (target, updates) = fixture
    val plan = Merge.upsert(target, updates, "id", Some("del"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"expected exactly one shuffle in:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side WindowGroupLimit in:\n$plan")
  }

  // ------------------------------------------------------------- SCD2

  private def changeLog = {
    val s = spark
    import s.implicits._
    // key 1: a → a (no-op) → b → a ; key 2: single version
    Seq(
      (1L, 1, 101L, "a"), (1L, 2, 102L, "a"),
      (1L, 3, 103L, "b"), (1L, 5, 104L, "a"),
      (2L, 10, 105L, "x"))
      .toDF("id", "seq", "chg_id", "v")
  }

  test("scd2: no-op changes suppressed, intervals chain, latest open") {
    val out = Merge.scd2(changeLog, "id", "seq", Seq("v"),
        tieBreak = Seq("chg_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)), r.getInt(4)))
      .toSet
    assert(out === Set(
      (1L, "a", 1, Some(3), 0),
      (1L, "b", 3, Some(5), 0),
      (1L, "a", 5, None, 1),
      (2L, "x", 10, None, 1)))
  }

  test("scd2: null attributes compare null-safe") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, 1, Option.empty[String]), (1L, 2, Option.empty[String]),
      (1L, 3, Some("a")))
      .toDF("id", "seq", "v")
    val out = Merge.scd2(log, "id", "seq", Seq("v"))
      .collect()
      .map(r => (Option(r.get(1)), r.getInt(2), Option(r.get(3))))
      .toSet
    // null → null is a NO-OP (suppressed); null → "a" opens a version
    assert(out === Set(
      (None, 1, Some(3)), (Some("a"), 3, None)))
  }

  test("scd2: equal-seq changes are ordered by the tie-break") {
    val s = spark
    import s.implicits._
    val log = Seq((1L, 1, 2L, "b"), (1L, 1, 1L, "a"))
      .toDF("id", "seq", "chg_id", "v")
    val out = Merge.scd2(log, "id", "seq", Seq("v"),
        tieBreak = Seq("chg_id"))
      .collect()
      .map(r => (r.getString(1), r.getInt(2), Option(r.get(3))))
      .toSet
    // chg_id 1 ("a") precedes chg_id 2 ("b") at the same seq
    assert(out === Set(("a", 1, Some(1)), ("b", 1, None)))
  }

  test("scd2Incremental: history fold + batch == full-log rebuild") {
    val s = spark
    import s.implicits._
    val old = Seq(
      (1L, 1, "a"), (1L, 2, "a"), (1L, 3, "b"), // a run + change
      (2L, 1, "x"))
      .toDF("id", "seq", "v")
    val batch = Seq(
      (1L, 5, "b"), // no-op vs the OPEN version — must stay suppressed
      (1L, 6, "c"), // closes b, opens c
      (2L, 7, "y"), // closes x
      (3L, 8, "z")) // brand-new key
      .toDF("id", "seq", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        Option(r.get(3)), r.getInt(4))).toSet
    val hist = Merge.scd2(old, "id", "seq", Seq("v"))
    val incremental = rows(
      Merge.scd2Incremental(hist, batch, "id", "seq", Seq("v")))
    val full = rows(
      Merge.scd2(old.unionByName(batch), "id", "seq", Seq("v")))
    assert(incremental === full)
    // and the fold actually exercised every interaction class
    assert(incremental.contains((1L, "c", 6, None, 1)))
    assert(incremental.contains((1L, "b", 3, Some(6), 0)),
      "the open b version must close at the c change, not the no-op")
    assert(incremental.contains((3L, "z", 8, None, 1)))
  }

  test("scd2 plan: ONE Exchange feeds both window passes") {
    val plan = Merge.scd2(changeLog, "id", "seq", Seq("v"),
        tieBreak = Seq("chg_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size === 1,
      s"expected exactly one shuffle (shared window spec) in:\n$plan")
    assert("\\bWindow\\b".r.findAllIn(plan).size >= 2,
      s"expected the lag and lead Window operators in:\n$plan")
  }

  test("snapshotDiff: added/removed/changed/unchanged classified; " +
      "fingerprints shuffle, not payloads") {
    val s = spark
    import s.implicits._
    val prev = Seq(
      (1L, "same text", "a"),
      (2L, "old text", "a"),
      (3L, "to remove", "b"),
      (4L, "src change", "a")
    ).toDF("id", "text", "src")
    val curr = Seq(
      (1L, "same text", "a"),   // unchanged
      (2L, "new text", "a"),    // changed (text)
      (4L, "src change", "b"),  // changed (non-text compare col)
      (5L, "brand new", "c")    // added
    ).toDF("id", "text", "src")
    val out = Merge.snapshotDiff(prev, curr, "id", Seq("text", "src"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "changed", 5L -> "added"), out.toString)
    // the join inputs are (key, fingerprint) projections: no text/src
    // attribute crosses the Exchange
    val plan = Merge.snapshotDiff(prev, curr, "id", Seq("text", "src"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange[^\\n]*".r.findAllIn(plan).toSeq
    assert(exchanges.nonEmpty &&
      exchanges.forall(e => !e.contains("text") && !e.contains("src")),
      s"payload columns crossed a shuffle:\n$plan")
  }
}
