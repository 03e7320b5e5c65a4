package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomMightContainSpec extends SparkSpec {

  test("no false negatives; fpp bounded; codegen and interpreted agree") {
    val s = spark
    import s.implicits._
    val members = (0L until 2000L).map(i => i * 2654435761L)
    val bloom = members.toDF("h").stat.bloomFilter("h", members.size, 0.03)
    val bloomB = s.sparkContext.broadcast(bloom)

    // every inserted hash MUST probe true — bloom filters never lie
    // negatively, which is what makes the prefilter safe
    val memberHits = members.toDF("h")
      .filter(BloomMightContain(col("h"), bloomB)).count()
    assert(memberHits == members.size)

    // disjoint probe set: false-positive rate near the configured fpp
    val probes = (1L to 20000L).map(i => i * 40503L + 7L)
      .filterNot(members.toSet)
    val fp = probes.toDF("h")
      .filter(BloomMightContain(col("h"), bloomB)).count()
    val rate = fp.toDouble / probes.size
    assert(rate < 0.1, s"false-positive rate $rate")

    // interpreted eval (forced by disabling codegen) matches codegen
    val expected = probes.count(bloom.mightContainLong)
    assert(fp == expected)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false") {
      val fpInterp = probes.toDF("h")
        .filter(BloomMightContain(col("h"), bloomB)).count()
      assert(fpInterp == fp)
    }
  }

  test("null input yields null (filtered out), non-long input rejected") {
    val s = spark
    import s.implicits._
    val bloom = Seq(1L).toDF("h").stat.bloomFilter("h", 10, 0.01)
    val bloomB = s.sparkContext.broadcast(bloom)
    val withNull = Seq(Some(1L), None).toDF("h")
    assert(withNull.filter(BloomMightContain(col("h"), bloomB))
      .count() == 1)
    intercept[Exception] {
      Seq("a").toDF("s").filter(BloomMightContain(col("s"), bloomB))
        .collect()
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
