package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join handling — the OTHER half of the skew story next to
  * [[Skew.saltedAgg]]: aggregation skew is handled by the two-phase
  * salt, JOIN skew is handled at runtime by AQE splitting oversized
  * partitions. This spec drives a hot-key join with the skew
  * thresholds scaled to fixture size and asserts AQE actually split
  * (the executed plan's shuffle read reports `skewed`), documenting
  * the production knobs
  * (`spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`,
  * `skewedPartitionFactor`, `advisoryPartitionSizeInBytes`). */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val s = spark
    import s.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // scale the skew cutoffs to fixture bytes so the hot key trips them
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // hot key 0 carries 50k rows padded with incompressible bytes
      // (constant padding would lz4-compress the hot partition below
      // the skew threshold); keys 1..50 one row each
      val left = ((1 to 50000).map(_ => 0L) ++ (1L to 50L))
        .toDF("k")
        .withColumn("pad", sha2(concat(col("k"),
          monotonically_increasing_id()), 256))
      val right = ((1 to 2000).map(_ => 0L) ++ (1L to 50L)).toDF("k")
      val joined = left.join(right, "k")
      // execute THIS QueryExecution via its RDD — count() builds a
      // separate plan and would leave joined's AdaptiveSparkPlan unrun
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(plan.toLowerCase.contains("skewed"),
        s"expected an AQE skewed shuffle read in:\n${plan.take(1500)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
