package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("curate: keeps only en docs above quality, deduped, stats attached") {
    val out = Curate(docs)
    val n = out.count()
    assert(n > 0 && n < docs.count())
    assert(out.filter(col("lang_pred") =!= "en").count() == 0)
    assert(out.filter(col("quality_score") < 0.1).count() == 0)
    // dedup invariant: content hashes unique
    assert(out.select("content_hash").distinct().count() == n)
  }

  test("curate: stage order prunes before dedup (planted junk is dropped early)") {
    val s = spark
    import s.implicits._
    val junk = Seq(
      (900001L, "11 22 33 44 55 !!!"),          // digit/punct junk
      (900002L, "der hund ist von dem haus und der katze mit dem ball im garten auf der wiese und nicht allein"))
      .toDF("doc_id", "text")
    val extended = docs.select("doc_id", "text").unionByName(junk)
    val out = Curate(extended)
    assert(out.filter(col("doc_id") === 900001L).count() == 0) // low quality
    assert(out.filter(col("doc_id") === 900002L).count() == 0) // German
  }

  test("curate withNearDedup: near-dup copy suppressed on top of exact stage") {
    val s = spark
    import s.implicits._
    val base = Curate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // plant a near-copy (one-word edit) of a kept doc with a larger id
    val keptId = base.min
    val text = docs.filter(col("doc_id") === keptId).head().getAs[String]("text")
    val words = text.split(" ")
    val edited = (words.take(words.length - 1) :+ "zzzedit").mkString(" ")
    val extended = docs.select("doc_id", "text")
      .unionByName(Seq((900100L, edited)).toDF("doc_id", "text"))
    val out = Curate.withNearDedup(extended, minJaccard = 0.5)
    assert(out.filter(col("doc_id") === keptId).count() == 1)
    assert(out.filter(col("doc_id") === 900100L).count() == 0)
  }
}
