package graft

import org.apache.spark.sql.functions._

/** Smoke + shape checks for the driver contract. */
class EntrySpec extends SparkSpec {

  test("entry: flagship chains the full reference demo and yields rows") {
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0)
    // every demo stage is observable in the output schema
    Seq("probability", "prediction", "label",
      "cv_best_param", "cv_best_metric",
      "split_test_rows", "split_test_accuracy").foreach { c =>
      assert(out.columns.contains(c), s"missing column $c")
    }
    val head = out.select("cv_best_metric", "split_test_accuracy").head()
    assert(head.getDouble(0) >= 0.0 && head.getDouble(0) <= 1.0)
    assert(head.getDouble(1) >= 0.0 && head.getDouble(1) <= 1.0)
  }

  test("entry: data dir is parameterizable (runs against a copied fixture)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory("graft-entry")
    Files.copy(Paths.get(s"$sf0001/customer.parquet"),
      tmp.resolve("customer.parquet"), StandardCopyOption.REPLACE_EXISTING)
    assert(SparkEntry.entry(spark, tmp.toString).count() > 0)
  }

  test("every oracle key has a registered query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("oracle family maps are key-disjoint (concatenation drops nothing)") {
    // The r16 family split assembles OracleSql.all with ++, which would
    // silently LAST-WINS a key registered in two families — the sum of
    // family sizes equals the merged size iff no key is duplicated.
    assert(OracleSql.familySizeSum === OracleSql.all.size,
      "a query key is registered in more than one OracleSql* family")
  }

  test("query family slices are key-disjoint and the assembly drops " +
      "nothing (r17 registry split, r17 advice #5)") {
    // SparkEntry.queries itself requires disjointness on every access;
    // this pins the same invariant from the outside (total registered
    // PAIRS == assembled size) so a refactor that removes the require
    // cannot silently regress to last-wins shadowing. Families are Seqs
    // of pairs, so a key registered twice WITHIN one family literal
    // also survives to this count (a Map literal would have collapsed
    // it before any check could see it).
    val slices = SparkEntry.queryFamilies
    assert(slices.map(_.size).sum === SparkEntry.queries.size,
      "a query key is registered more than once (within or across " +
        "EntryQueries* families)")
  }

  test("registered queries emit no array/vector columns except declared") {
    // Driver pandas diff crashes on array columns (round-1 lesson):
    // oracle-checked queries must be scalar-only.
    val allowArray = Set[String]() // none today
    SparkEntry.oracleSql.keys.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.schema.fields.foreach { f =>
        val bad = f.dataType.typeName == "array" ||
          f.dataType.typeName.startsWith("vector")
        assert(!bad || allowArray.contains(name),
          s"$name emits non-scalar column ${f.name}: ${f.dataType}")
      }
    }
  }

  test("spreadScan: widens an under-parallel scan to defaultParallelism, " +
      "no-ops at or above it, and never changes rows (r18 optimization)") {
    val p = spark.sparkContext.defaultParallelism
    val docs = graft.sources.Sources.parquetTable(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"))
    // the single-row-group fixture scans to fewer partitions than p
    assume(docs.rdd.getNumPartitions < p)
    val spread = SparkEntry.spreadScan(docs)
    assert(spread.rdd.getNumPartitions == p)
    // rows are the scan's rows exactly (repartition moves, never edits)
    assert(spread.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // at/above parallelism the frame passes through untouched — the
    // 100 TB case (many files/row groups) must not gain an Exchange
    val wide = docs.repartition(p + 2, col("doc_id"))
    assert(SparkEntry.spreadScan(wide) eq wide)
  }
}
