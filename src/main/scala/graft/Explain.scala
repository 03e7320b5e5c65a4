package graft
import org.apache.spark.sql.SparkSession

/** Plan audit: print the formatted physical plan of registered queries.
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  * The things to look for per 100 TB design review: PushedFilters /
  * ReadSchema on scans, broadcast vs sort-merge joins, ReusedExchange
  * on self-joins, WholeStageCodegen span width, absence of
  * CartesianProduct outside declared broadcast-bounded cross joins. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // SPARK_EXPLAIN_NO_BROADCAST=1 disables broadcast joins to preview
    // the at-scale plan shape (what AQE would pick once both sides are
    // past the broadcast threshold).
    val bcastThreshold =
      if (sys.env.get("SPARK_EXPLAIN_NO_BROADCAST").contains("1")) "-1"
      else "10485760"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", bcastThreshold)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_EXPLAIN_RUN=1 executes the query first and prints the
    // AQE-final plan (runtime join strategy, ReusedExchange/stage reuse
    // are only visible post-execution).
    val run = sys.env.get("SPARK_EXPLAIN_RUN").contains("1")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        if (run) {
          // execute THIS QueryExecution via its RDD: count()/write both
          // build a separate plan, leaving df's AdaptiveSparkPlan unrun
          // (isFinalPlan=false) — toRdd runs the exact plan we print
          val qe = df.queryExecution
          qe.toRdd.foreachPartition(_ => ())
          println(qe.executedPlan.toString)
        } else df.explain("formatted")
      } catch { case e: Throwable =>
        println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
