package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a pre-hashed long against a BROADCAST Bloom
  * filter, with whole-stage codegen — the prefilter that lets a corpus
  * stream drop non-matching rows BEFORE any shuffle.
  *
  * Why a custom Expression (the brief's preferred extension order):
  * Spark's own `BloomFilterMightContain` is wired to the runtime
  * row-group filtering rule and expects the binary output of
  * `BloomFilterAggregate` inside the same plan; there is no public
  * Column function for probing a caller-built filter, and the UDF
  * alternative boxes every candidate long and breaks the
  * WholeStageCodegen span. This expression takes the driver-built
  * `org.apache.spark.util.sketch.BloomFilter` VIA A BROADCAST — tasks
  * fetch the filter once per executor instead of once per task
  * closure, which is the difference that matters when the benchmark
  * gram filter is megabytes and a 1000-executor stage runs 100k tasks.
  *
  * The child must be the SAME hash both sides of the eventual
  * verification join use (this library: `xxhash64(gram)`); the filter
  * is built over those hashes with `DataFrameStatFunctions.bloomFilter`
  * (which `putLong`s them — `mightContainLong` is the matching probe).
  * False positives are expected and SAFE: every caller re-verifies
  * survivors with an exact equi-join, so `fpp` tunes cost, never
  * correctness.
  *
  * Not registered in [[graft.GraftExtensions]]: a SQL signature cannot
  * carry a broadcast handle — this is a programmatic-API-only function
  * by nature.
  */
case class BloomMightContain(
    child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument (a pre-hashed value), " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle rides the generated class's reference array;
    // .value() resolves to the executor-local copy at first access
    val ref = ctx.addReferenceObj("bloomBroadcast", bloom,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $ref.value())" +
        s".mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  /** Column-API entry point. */
  def apply(hashed: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftSql.column(BloomMightContain(GraftSql.expression(hashed), bloom))
}
