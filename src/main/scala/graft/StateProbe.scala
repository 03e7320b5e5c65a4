package graft
import org.apache.spark.sql.SparkSession

/** State-store provider A/B probe for the streaming keepers (r17
  * verdict item 7): run registered stream_* queries under BOTH the
  * default HDFS-backed provider and RocksDBStateStoreProvider in one
  * JVM, and print one JSON line per (query, provider) carrying wall
  * seconds plus the captured state-operator metrics
  * ([[SparkEntry.lastStreamMetrics]] — state rows, memory, commit /
  * update times). The keepers' scale contract names RocksDB as the
  * at-volume provider (state spills off-heap instead of growing the
  * executor heap); this turns that scaladoc claim into a committed
  * same-box measurement (PLANS.md records the runs).
  *
  * Usage: runMain graft.StateProbe [sfDir] [query...]
  *   defaults: sfDir = /root/testdata/sf0.1, queries =
  *   stream_dedup_near stream_phash_near stream_embed_near.
  * Each (query, provider) runs twice and reports the min (the Bench
  * protocol); providers alternate per query so a box-load window
  * cannot bias one side of the A/B. */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("stream_dedup_near", "stream_phash_near", "stream_embed_near")
    // validate BEFORE paying SparkSession startup (the Bench rule): a
    // typo'd name must fail with the valid alternatives, not a bare
    // key-not-found after 30 s of JVM warmup
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")} — valid " +
        s"stream rows: ${SparkEntry.queries.keySet.filter(
          _.startsWith("stream_")).toSeq.sorted.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val rocks = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    // measurement protocol is BenchHarness — the ONE definition Bench
    // also uses, so these numbers stay comparable with the committed
    // BENCH_* artifacts (a failed run reports sec -1, Bench's failure
    // sentinel, and the remaining (query, provider) legs still run)
    import BenchHarness.r4
    names.foreach { name =>
      Seq("default" -> None, "rocksdb" -> Some(rocks)).foreach {
        case (label, provider) =>
          provider match {
            case Some(p) => spark.conf.set(providerKey, p)
            case None => spark.conf.unset(providerKey)
          }
          val runs = (1 to 2).map { _ =>
            val (sec, ok) = BenchHarness.timedRun(spark, sfDir, name,
              SparkEntry.queries(name))
            (sec, ok.isDefined, SparkEntry.lastStreamMetrics)
          }
          val allOk = runs.forall(_._2)
          val best = runs.filter(_._2).minByOption(_._1)
          println(s"""{"probe":"state_provider","query":"$name",""" +
            s""""provider":"$label",""" +
            s""""sec":${best.map(b => r4(b._1)).getOrElse("-1")},""" +
            s""""ok":$allOk,""" +
            s""""runs":[${runs.map(r => r4(r._1)).mkString(",")}],""" +
            s""""stream_state":${
              best.flatMap(_._3).getOrElse("null")},"sf":"$sfDir"}""")
      }
    }
    spark.stop()
  }
}
