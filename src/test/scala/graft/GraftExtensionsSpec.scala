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
