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
    def runOnce(name: String): (Double, Option[String]) = {
      spark.catalog.clearCache()
      SparkEntry.lastStreamMetrics = None
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, SparkEntry.lastStreamMetrics)
    }
    def r4(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    names.foreach { name =>
      Seq("default" -> None, "rocksdb" -> Some(rocks)).foreach {
        case (label, provider) =>
          provider match {
            case Some(p) => spark.conf.set(providerKey, p)
            case None => spark.conf.unset(providerKey)
          }
          val runs = (1 to 2).map(_ => runOnce(name))
          val best = runs.minBy(_._1)
          println(s"""{"probe":"state_provider","query":"$name",""" +
            s""""provider":"$label","sec":${r4(best._1)},""" +
            s""""runs":[${runs.map(r => r4(r._1)).mkString(",")}],""" +
            s""""stream_state":${best._2.getOrElse("null")},"sf":"$sfDir"}""")
      }
    }
    spark.stop()
  }
}
