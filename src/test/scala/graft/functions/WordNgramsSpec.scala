package graft.functions

import graft.SparkSpec
import org.apache.spark.ml.feature.{NGram, RegexTokenizer}
import org.apache.spark.sql.functions._

class WordNgramsSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "The quick brown fox, the quick brown DOG!  And 42 badgers."),
      (2L, "short one"),                 // under n=3 tokens
      (3L, "...!!!"),                    // zero tokens
      (4L, "Unicode touché naïve café — déjà vu encore"),
      (5L, "a b c d e f g h")
    ).toDF("doc_id", "text")
  }

  test("bit-identical to the RegexTokenizer + NGram transformer pair") {
    val n = 3
    val tokens = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens")
      .setPattern("[^\\p{L}\\p{N}]+")
      .transform(fixture)
    val mllib = new NGram().setN(n)
      .setInputCol("tokens").setOutputCol("mllib_grams")
      .transform(tokens)
    val rows = mllib.select(col("doc_id"), col("tokens"),
        col("mllib_grams"),
        WordNgrams(col("text"), n, strictFallback = false).as("loose"),
        WordNgrams(col("text"), n, strictFallback = true).as("strict"))
      .collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](1)
      val grams = r.getSeq[String](2)
      val loose = r.getSeq[String](3)
      val strict = r.getSeq[String](4)
      if (toks.length >= n) {
        assert(loose == grams, s"doc ${r.getLong(0)}: loose != NGram")
        assert(strict == grams, s"doc ${r.getLong(0)}: strict != NGram")
      } else if (toks.nonEmpty) {
        assert(loose == toks, s"doc ${r.getLong(0)}: loose fallback")
        assert(strict == Seq(toks.mkString(" ")),
          s"doc ${r.getLong(0)}: strict fallback")
      } else {
        assert(loose.isEmpty && strict.isEmpty)
      }
    }
  }

  test("callable from SQL after registration") {
    org.apache.spark.sql.GraftSql.registerFunctions(spark)
    val g = spark.sql(
      "SELECT word_ngrams('Alpha beta gamma delta', 3) AS g")
      .head().getSeq[String](0)
    assert(g == Seq("alpha beta gamma", "beta gamma delta"))
    assert(spark.sql("SELECT word_ngrams('tiny doc', 5, true) AS g")
      .head().getSeq[String](0) == Seq("tiny doc"))
  }
}
