package graft

import org.apache.spark.sql.GraftSql

class GraftExtensionsSpec extends SparkSpec {

  test("custom expressions callable from plain SQL after registration") {
    GraftSql.registerFunctions(spark)
    val cos = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val chunks = spark.sql(
      "SELECT rolling_chunk_hashes('the quick brown fox jumps over the lazy dog', 4, 8) AS h")
      .head().getSeq[Long](0)
    assert(chunks.nonEmpty)
    // optional args defaulted
    assert(spark.sql("SELECT rolling_chunk_hashes('abc') AS h")
      .head().getSeq[Long](0).nonEmpty)
    val sig = spark.sql(
      "SELECT hyperplane_signature(array(0.5d, -0.25d, 1.0d), 4, 12) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
    assert(spark.sql("SELECT hyperplane_signature(array(1.0d)) AS s")
      .head().getSeq[Long](0).length == 8)
  }

  test("registerFunctions into a FRESH non-extension session: every " +
      "registered function answers SQL there, and none leak in before " +
      "registration (r14, Spark-upgrade canary)") {
    // newSession() builds a brand-new SessionState — fresh function
    // registry, no extensions, exactly the driver-harness shape where
    // graft never controls session construction.
    val fresh = spark.newSession()
    val e = intercept[Exception] {
      fresh.sql("SELECT cosine_similarity(array(1.0d), array(1.0d))")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("unresolved") ||
      e.getMessage.contains("cosine_similarity"), e.getMessage)
    GraftSql.registerFunctions(fresh)
    // one real evaluation per registered function — if a Spark minor
    // bump changes the FunctionRegistry/ExpressionInfo internals this
    // is the test that goes red
    assert(math.abs(fresh.sql(
      "SELECT cosine_similarity(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .head().getDouble(0) - 1.0) < 1e-12)
    assert(fresh.sql("SELECT rolling_chunk_hashes('abcdefgh abcdefgh') AS h")
      .head().getSeq[Long](0).nonEmpty)
    assert(fresh.sql("SELECT hyperplane_signature(array(1.0d, -2.0d)) AS s")
      .head().getSeq[Long](0).length == 8)
    assert(fresh.sql(
      "SELECT minhash_signature(array('a', 'b', 'c'), 16) AS m")
      .head().getSeq[Long](0).length == 16)
    assert(fresh.sql("SELECT word_ngrams('one two three', 2) AS g")
      .head().getSeq[String](0) == Seq("one two", "two three"))
    assert(fresh.sql("SELECT simhash_signature(array('a', 'b')) AS s")
      .head().getLong(0) != 0L)
    assert(fresh.sql(
      "SELECT image_meta(cast(null as binary)) IS NULL AS n")
      .head().getBoolean(0))
    // every identifier in the registration table is visible in the
    // fresh catalog — a function added to GraftExtensions.functions
    // but broken at registration time can't hide behind the 7 above
    graft.GraftExtensions.functions.foreach { case (ident, _, _) =>
      assert(fresh.catalog.functionExists(ident.funcName), ident.funcName)
    }
    // the Column <-> Expression converters round-trip (the other half
    // of the private[sql] bridge GraftSql fronts)
    import org.apache.spark.sql.functions.lit
    val col = GraftSql.column(GraftSql.expression(lit(7)))
    assert(fresh.range(1).select(col.as("v")).head().getInt(0) == 7)
  }

  test("registration is idempotent and arity errors are caught") {
    GraftSql.registerFunctions(spark)
    GraftSql.registerFunctions(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0d))").collect()
    }
    assert(e.getMessage.contains("2 arguments") ||
      e.getMessage.toLowerCase.contains("argument"))
  }
}
