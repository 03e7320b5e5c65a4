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
}
