package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries sketch state: `counts` maps each tracked item to its
  * LOWER-BOUND counter; `maxError` is the cumulative decrement applied
  * so far, i.e. the sketch-wide error bound — for every item (tracked
  * or not), `count(item) <= true_count(item) <= count(item) +
  * maxError` (untracked ⇒ count 0). `maxError == 0` certifies the
  * sketch never overflowed and every counter is EXACT. */
final case class MgState(counts: Map[String, Long], maxError: Long)

/** Misra–Gries frequent-items ("heavy hitters") sketch as a typed
  * [[Aggregator]] — the bounded-state sibling of the EXACT
  * [[graft.llm.TextAnalysis.topNgrams]] (which shuffles the whole
  * keyed vocabulary): at most `capacity` counters per aggregation
  * buffer, ever, regardless of input cardinality.
  *
  * Why it matters at 100 TB: exact top-k token/n-gram counting keys a
  * shuffle by the full vocabulary — web-scale n-gram vocabularies run
  * to billions of keys, so even with partial aggregation the Exchange
  * carries (distinct-per-task × tasks) rows and the final aggregate
  * holds the whole tail. The MG plan is a per-task sketch of fixed
  * size merged pairwise: the Exchange carries ONE `capacity`-entry
  * row per map task, the final state is one sketch, and the tail
  * never crosses the wire. The classical guarantees survive merging
  * (Agarwal et al., "Mergeable Summaries", PODS'12):
  * every item with true count > N/(capacity+1) is retained, and each
  * counter undershoots its true count by at most `maxError` ≤
  * N/(capacity+1).
  *
  * Sketch algebra:
  *  - reduce: tracked item → +1; untracked with spare room → insert
  *    at 1; untracked and full → decrement ALL counters by 1 (drop
  *    zeros), `maxError` +1 — the classical MG step, O(capacity) but
  *    amortized O(1): each decrement pass cancels capacity+1
  *    previously-paid increments.
  *  - merge: sum counters; if over capacity, subtract the
  *    (capacity+1)-th largest counter value from every counter and
  *    drop the non-positive — the mergeable-summaries offset trick;
  *    `maxError` adds across inputs plus the subtracted offset.
  *
  * Determinism: when `capacity` ≥ the distinct-item count the sketch
  * NEVER decrements — every counter is the exact count, `maxError` is
  * 0, and the result is independent of partitioning and merge order
  * (plain map-sum). That exact regime is what the DuckDB oracle row
  * pins (`text_heavy_hitters_sketch`, bit-equal to the exact GROUP BY
  * twin including `max_error = 0`); the approximation regime's
  * retention + bound guarantees are spec'd on a planted skewed stream
  * under forced multi-partition merges (FrequentItemsSpec). In the
  * approximate regime the SET of survivors near the N/(capacity+1)
  * frequency floor may vary with merge order — inherent to MG, why
  * the oracle pins the exact regime only.
  *
  * Registered via `functions.udaf(...)` → Catalyst plans a
  * ScalaAggregator inside ObjectHashAggregate with map-side partial
  * merge: one Exchange of sketch rows, never a vocabulary-keyed
  * shuffle. The immutable-map buffer trades ~2× constant factor for
  * encoder transparency; a production tuning pass would swap in a
  * TypedImperativeAggregate over an open-addressing map, same
  * algebra. */
final class MisraGries(capacity: Int)
    extends Aggregator[String, MgState, MgState] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: MgState = MgState(Map.empty, 0L)

  override def reduce(b: MgState, item: String): MgState = {
    // null is NOT a sketchable item: the persisted layout reserves the
    // null slot for the maxError row ([[FrequentItems.writeSketch]]),
    // so ingesting one here would consume a counter, skew every bound,
    // and only surface later as a writeSketch require failure. Ignore
    // at the point of ingestion. (Contract note: SQL GROUP BY *does*
    // retain a NULL group, so this skip is NOT mirrored by the oracle
    // twin's aggregation — the twins stay aligned only because their
    // gram derivations cannot yield NULL from non-null text; an item
    // expression that can go null must be coalesced or filtered by
    // the caller before sketching.)
    if (item == null) return b
    val c = b.counts
    c.get(item) match {
      case Some(n) => MgState(c.updated(item, n + 1L), b.maxError)
      case None if c.size < capacity =>
        MgState(c.updated(item, 1L), b.maxError)
      case None =>
        val dec = c.iterator.collect {
          case (k, v) if v > 1L => k -> (v - 1L)
        }.toMap
        MgState(dec, b.maxError + 1L)
    }
  }

  override def merge(a: MgState, b: MgState): MgState = {
    val summed = b.counts.foldLeft(a.counts) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    val err = a.maxError + b.maxError
    if (summed.size <= capacity) MgState(summed, err)
    else {
      // offset = (capacity+1)-th largest counter; keep v > offset —
      // at most `capacity` survivors by construction
      val offset = summed.valuesIterator.toArray
        .sorted(Ordering[Long].reverse).apply(capacity)
      val kept = summed.iterator.collect {
        case (k, v) if v > offset => k -> (v - offset)
      }.toMap
      MgState(kept, err + offset)
    }
  }

  override def finish(r: MgState): MgState = r
  override def bufferEncoder: Encoder[MgState] = Encoders.product[MgState]
  override def outputEncoder: Encoder[MgState] = Encoders.product[MgState]
}

/** The persisted-sketch workflow around [[MisraGries]] — the shape a
  * deployment actually runs at 100 TB: sketch each day's (or each
  * ingest batch's) items INDEPENDENTLY, persist the capacity-bounded
  * state (a few KB), and answer "top-k over any span" by MERGING the
  * stored sketches — no rescan of history, ever. Mergeability with
  * intact guarantees is the Misra–Gries selling point over a plain
  * top-k (Agarwal et al., Mergeable Summaries, PODS'12); this object
  * makes the artifact side of that real: [[sketch]] collects ONE
  * bounded state row per corpus slice, [[writeSketch]]/[[readSketch]]
  * round-trip it through parquet, [[merge]] applies the aggregator's
  * own merge rule, [[topK]] renders a merged state back into the
  * (gram, cnt, max_error) frame the oracle checks.
  *
  * Persisted layout: rows `(item, cnt)` for the counters plus ONE
  * reserved `item IS NULL` row whose `cnt` is `maxError` — the whole
  * file is ≤ capacity+1 rows. Exactness composes: if every slice's
  * sketch stayed exact (maxError 0) and the merged size fits the
  * capacity, the merged counts are exact too — what the
  * text_heavy_hitters_incremental oracle row pins end-to-end. */
object FrequentItems {

  /** The registered queries' capacity — ONE constant shared by the
    * one-shot row, every stage of the incremental row and the
    * vocabulary-margin CI contract, so a future bump cannot drift
    * between them (the sf1 lesson: a capacity that only covers part
    * of the workflow exits the exact regime at gate time). */
  val DefaultCapacity: Int = 4096

  /** Aggregate an item column into one MG state — a bounded driver
    * artifact (≤ capacity entries), like collecting KMeans centroids. */
  def sketch(items: org.apache.spark.sql.DataFrame, column: String,
      capacity: Int): MgState = {
    val spark = items.sparkSession
    import spark.implicits._
    val mg = org.apache.spark.sql.functions.udaf(
      new MisraGries(capacity), Encoders.STRING)
    items
      .agg(mg(org.apache.spark.sql.functions.col(column)).as("sk"))
      .select("sk.*").as[MgState].head()
  }

  def writeSketch(spark: org.apache.spark.sql.SparkSession,
      state: MgState, path: String): Unit = {
    import spark.implicits._
    // the null item slot is RESERVED for the maxError row — a null key
    // in the counts map would alias it and corrupt the round-trip
    require(!state.counts.contains(null),
      "writeSketch: null items are not persistable (reserved slot); " +
        "filter or fill the item column before sketching")
    (state.counts.toSeq.map { case (k, v) => (Option(k), v) } :+
      (Option.empty[String], state.maxError))
      .toDF("item", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readSketch(spark: org.apache.spark.sql.SparkSession,
      path: String): MgState = {
    val rows = spark.read.parquet(path).collect()
    val (err, items) = rows.partition(_.isNullAt(0))
    require(err.length == 1,
      s"sketch file $path must carry exactly one maxError row")
    MgState(items.map(r => r.getString(0) -> r.getLong(1)).toMap,
      err.head.getLong(1))
  }

  /** The aggregator's own merge rule over stored states. */
  def merge(a: MgState, b: MgState, capacity: Int): MgState =
    new MisraGries(capacity).merge(a, b)

  /** Render a state as the ranked (gram, cnt, max_error) frame — a
    * ≤ capacity-row local relation, sorted/cut by Spark so tie rules
    * match the exact twin's. */
  def topK(spark: org.apache.spark.sql.SparkSession, state: MgState,
      k: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    state.counts.toSeq.toDF("gram", "cnt")
      .withColumn("max_error", lit(state.maxError))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)
  }
}
