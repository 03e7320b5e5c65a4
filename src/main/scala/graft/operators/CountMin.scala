package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * relational composition — the point-query frequency estimator that
  * completes the repo's sketch-state taxonomy (HLL = cardinality,
  * Misra-Gries = heavy hitters, KMV bottom-k = distinct/overlap/
  * quantile samples; CMS = per-key counts under a FIXED memory bound).
  *
  * Everything is deterministic: the d hash rows are 60-bit md5 draws
  * (`i:key`, the repo's shared cross-engine hash recipe) reduced mod
  * `width`, so the counter matrix, the point estimates, and even the
  * over-count errors are restated bit-exactly by the DuckDB oracle —
  * the KMV property (approximate answers, exact restatement), not the
  * HLL one (tolerance gates).
  *
  * Scale shape: the sketch build is a groupBy over (depth, bucket) —
  * partial aggregation caps what any map task sends through the
  * Exchange at d×w rows (the sketch size), NEVER the key domain, which
  * is the whole point at a 100 TB token stream whose vocabulary would
  * otherwise be the shuffle. The artifact is a plain (depth, bucket,
  * cnt) parquet frame: engine-neutral, auditable, and mergeable by
  * simple summation (counter matrices add), so per-batch sketches
  * persisted by 1000 executors reduce to the corpus sketch without
  * rescanning history. Estimates broadcast the d×w sketch against the
  * probe side — probes can be corpus-scale, the sketch never is.
  *
  * Guarantees (spec'd in CountMinSpec): est ≥ exact always (counters
  * only over-count), and P[est ≤ exact + εN] ≥ 1−δ at w = ⌈e/ε⌉,
  * d = ⌈ln 1/δ⌉. */
object CountMin {

  val DefaultDepth = 4
  val DefaultWidth = 256

  /** Row-`i` bucket of a key: 60-bit md5 hash of "i:key" mod `width`.
    * The hash value is non-negative (15 hex chars), so plain `%`
    * matches DuckDB's `%` with no sign fix-up. */
  def bucket(i: Int, key: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 15),
      16, 10).cast("long") % lit(width.toLong)

  private def bucketsFor(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i => bucket(i, key, width)): _*)

  /** Build the sketch over `keyCol` occurrences: one row per touched
    * (depth, bucket) cell with its counter. ≤ depth×width rows total;
    * untouched cells are implicit zeros (the estimate side restores
    * them via a left join). NULL keys carry no countable identity and
    * are dropped, mirrored by the oracle's non-null tokenization. */
  def sketch(df: DataFrame, keyCol: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame =
    df.filter(keyCol.isNotNull)
      .select(posexplode(bucketsFor(keyCol, depth, width))
        .as(Seq("depth", "bucket")))
      .groupBy(col("depth"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** [[sketch]] from PRE-AGGREGATED (key, count) rows: cell counters
    * are sums of the counts of the keys hashing there, so building
    * from `groupBy(key).count()` output is IDENTICAL to building from
    * the raw occurrence stream — same cells, same counters, same
    * estimates (group-sums of a partition of the occurrences equal the
    * total sums). The at-scale point (r17 verdict item 5): when the
    * caller already needs per-key exact counts (the probe side of
    * every registered CMS row), this builds the sketch off that
    * key-scale aggregate instead of re-tokenizing and re-exploding the
    * corpus — the raw stream is scanned ONCE, and the sketch shuffle
    * moves ≤ depth × |keys| pre-summed rows, never the occurrence
    * volume. NULL keys are dropped, matching [[sketch]]. */
  def sketchWeighted(counts: DataFrame, keyCol: Column, cntCol: Column,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame =
    counts.filter(keyCol.isNotNull)
      .select(cntCol.as("w"),
        posexplode(bucketsFor(keyCol, depth, width))
          .as(Seq("depth", "bucket")))
      .groupBy(col("depth"), col("bucket"))
      .agg(sum(col("w")).as("cnt"))

  /** Merge any number of per-batch sketch frames (union them first):
    * counter matrices add cell-wise, and because group-sums of a
    * disjoint split equal the total sums, merge-then-estimate is
    * IDENTICAL to one-shot-build-then-estimate — which is why the
    * merged lifecycle row shares the build row's oracle verbatim. */
  def merge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("depth"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query estimates for `probeCol` of `probes`: min over the d
    * rows of the counter at that row's bucket, absent cells reading 0.
    * The SKETCH side is broadcast (≤ d×w rows by construction); the
    * probe side streams at any scale.
    *
    * Probe contract (ADVICE r15): NULL probe keys are DROPPED here —
    * [[sketch]] never counted them (its isNotNull filter), so a null
    * probe has no defined estimate and would otherwise hash to null
    * buckets whose join misses coalesce to a misleading cm_est = 0.
    * Duplicate probe rows collapse to ONE output row (the groupBy is
    * over all probe columns) — dedupe upstream if per-occurrence rows
    * matter. */
  def estimate(sk: DataFrame, probes: DataFrame, probeCol: String,
      depth: Int = DefaultDepth, width: Int = DefaultWidth): DataFrame =
    probes
      .filter(col(probeCol).isNotNull)
      .select(col("*"),
        posexplode(bucketsFor(col(probeCol), depth, width))
          .as(Seq("depth", "bucket")))
      .join(broadcast(sk), Seq("depth", "bucket"), "left")
      .groupBy(probes.columns.map(col).toSeq: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
}
