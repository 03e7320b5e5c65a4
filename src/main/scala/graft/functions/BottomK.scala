package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k sketch state: the `k` smallest DISTINCT 60-bit hashes seen
  * so far (ascending), each carrying one Double payload. Both arrays
  * share length ≤ k; `hashes(i)` owns `values(i)`. */
final case class BkState(hashes: Array[Long], values: Array[Double])

/** Bottom-k ("K-Minimum-Values" / bottom-k sample) sketch as a typed
  * [[Aggregator]] — the third leg of this repo's mergeable-summaries
  * trio: frequency ([[MisraGries]]), cardinality (DataSketches HLL,
  * `operators.Events.cardinalitySketch`), and now the one primitive
  * that answers BOTH distinct-count set algebra (KMV: union /
  * intersection estimates, Beyer et al., SIGMOD'07) and
  * quantile-by-uniform-sample, from the same ≤ k-entry state.
  *
  * Two instantiations, same machinery:
  *  - **KMV distinct count**: hash the VALUE whose cardinality is
  *    asked (`BottomK.hash64`); duplicates collide into one slot by
  *    construction. With u₍ₖ₎ the k-th smallest hash normalized to
  *    (0,1), distinct ≈ (k−1)/u₍ₖ₎; fewer than k distinct values means
  *    the sketch holds ALL of them — the estimate degrades to EXACT.
  *    Set algebra rides the same state: the k smallest of a UNION of
  *    sketches is the union's sketch (close under merge), and the
  *    fraction of those present in both sides estimates the Jaccard —
  *    hence intersection sizes — without ever touching the raw sets.
  *  - **Bottom-k uniform sample**: hash a row-UNIQUE key (doc_id) and
  *    carry the measured column as payload; the k smallest hashes are
  *    a uniform without-replacement sample of rows, mergeable across
  *    any partitioning, so sample quantiles/means of the payload are
  *    consistent estimators with O(1/√k) rank error.
  *
  * Why this beats the sibling sketches for auditability: MG's
  * approximate regime and HLL's register estimate are merge-order- or
  * implementation-opaque, so their driver rows gate tolerances. The
  * bottom-k state is a pure FUNCTION OF THE INPUT SET — deterministic,
  * merge-order-independent in EVERY regime (min-k of a set ignores
  * arrival order), and built on the repo's cross-engine md5 recipe —
  * so a DuckDB oracle re-derives sketch, estimate, and intersection
  * arithmetic bit-exactly. Approximation quality becomes a hash-EXACT
  * number, not a tolerance boolean.
  *
  * At 100 TB: the plan is the MG plan — per-task bounded partials,
  * ONE ≤ k-entry row per map task over the Exchange, never a shuffle
  * keyed by the sketched domain; persisted sketches are two plain
  * parquet array columns (no engine-private bytes — readable by ANY
  * engine, unlike HLL register blobs), KBs per group per batch, and
  * "distinct over any time span" is a merge of stored rows with no
  * history rescan.
  *
  * Collision note: 60-bit hashes collide with probability ~n²/2⁶¹ —
  * negligible at sketchable cardinalities, and MIRRORED by the oracle
  * (both engines hash identically), so even a collision cannot break
  * hash-exactness. On a payload conflict at one hash (only possible
  * when the hashed key is not row-unique) the smaller payload wins —
  * an order-free tiebreak that keeps merge-order independence. */
final class BottomK(k: Int)
    extends Aggregator[(Long, Double), BkState, BkState] {

  require(k >= 2, s"k must be >= 2 (the KMV estimator needs k-1 > 0), got $k")

  override def zero: BkState = BkState(Array.emptyLongArray, Array.emptyDoubleArray)

  override def reduce(b: BkState, in: (Long, Double)): BkState = {
    val (h, v) = in
    val hs = b.hashes
    val n = hs.length
    val i = java.util.Arrays.binarySearch(hs, h)
    if (i >= 0) {
      // duplicate hash: keep the min payload (order-free tiebreak)
      if (v < b.values(i)) {
        val nv = b.values.clone(); nv(i) = v
        BkState(hs, nv)
      } else b
    } else {
      val ins = -(i + 1)
      if (n >= k && ins >= k) b // larger than the current k-th: skip
      else {
        val m = math.min(n + 1, k)
        val nh = new Array[Long](m); val nv = new Array[Double](m)
        System.arraycopy(hs, 0, nh, 0, ins)
        System.arraycopy(b.values, 0, nv, 0, ins)
        nh(ins) = h; nv(ins) = v
        val tail = m - ins - 1 // entries kept after the insert point
        System.arraycopy(hs, ins, nh, ins + 1, tail)
        System.arraycopy(b.values, ins, nv, ins + 1, tail)
        BkState(nh, nv)
      }
    }
  }

  override def merge(a: BkState, b: BkState): BkState = BottomK.mergeStates(a, b, k)

  override def finish(r: BkState): BkState = r
  override def bufferEncoder: Encoder[BkState] = Encoders.product[BkState]
  override def outputEncoder: Encoder[BkState] = Encoders.product[BkState]
}

/** Merge persisted [[BkState]] rows (the `hll_union_agg` analog):
  * input is a sketch per stored batch, output the k smallest distinct
  * hashes across all of them — exactly the sketch a one-shot pass
  * over the unioned raw inputs would build.
  *
  * k-mismatch semantics: merging a sketch built with a LARGER k is
  * sound (the min-k of a k′-sketch, k′ > k, IS the k-sketch — the
  * merge truncates correctly); a sketch built with a SMALLER k is
  * indistinguishable from one that never filled, so downstream
  * estimates at this k would silently degrade to "exact" — keep one
  * k per workflow ([[BottomK.DefaultK]]) and see the
  * [[BottomK.estimateFromHashes]] guard for the detectable direction. */
final class BottomKMerge(k: Int)
    extends Aggregator[BkState, BkState, BkState] {
  override def zero: BkState = BkState(Array.emptyLongArray, Array.emptyDoubleArray)
  override def reduce(b: BkState, in: BkState): BkState =
    BottomK.mergeStates(b, in, k)
  override def merge(a: BkState, b: BkState): BkState =
    BottomK.mergeStates(a, b, k)
  override def finish(r: BkState): BkState = r
  override def bufferEncoder: Encoder[BkState] = Encoders.product[BkState]
  override def outputEncoder: Encoder[BkState] = Encoders.product[BkState]
}

object BottomK {

  /** The registered queries' k — one constant shared by the batch
    * round-trip row, the overlap row and the streaming twin, so a
    * future bump cannot drift between the workflow's stages. 64 keeps
    * the sf0.01 fixture (150 distinct users per event type) in the
    * APPROXIMATE regime — the estimator, not just the exact fallback,
    * is what the oracle rows pin. */
  val DefaultK: Int = 64

  /** Classic sorted-distinct two-pointer merge capped at k; equal
    * hashes keep the min payload (see class doc). */
  private[functions] def mergeStates(a: BkState, b: BkState, k: Int): BkState = {
    if (a.hashes.isEmpty) return b
    if (b.hashes.isEmpty) return a
    val m = math.min(k, a.hashes.length + b.hashes.length)
    val nh = new Array[Long](m); val nv = new Array[Double](m)
    var i = 0; var j = 0; var o = 0
    while (o < m && (i < a.hashes.length || j < b.hashes.length)) {
      val takeA =
        j >= b.hashes.length ||
          (i < a.hashes.length && a.hashes(i) <= b.hashes(j))
      if (takeA) {
        nh(o) = a.hashes(i)
        nv(o) =
          if (j < b.hashes.length && b.hashes(j) == a.hashes(i)) {
            val v = math.min(a.values(i), b.values(j)); j += 1; v
          } else a.values(i)
        i += 1
      } else {
        nh(o) = b.hashes(j); nv(o) = b.values(j); j += 1
      }
      o += 1
    }
    if (o == m) BkState(nh, nv)
    else BkState(java.util.Arrays.copyOf(nh, o), java.util.Arrays.copyOf(nv, o))
  }

  /** THE cross-engine 60-bit hash: the first 15 hex chars of
    * `md5(string(c))` read base-16 — positive, < 2⁶⁰, and restated in
    * DuckDB as `('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15))
    * ::BIGINT` (the repo-wide md5 parity recipe, cf.
    * `llm.Curate.mixCorpus`). NULL in → NULL out; callers must filter
    * (the aggregator's Long input cannot carry null). */
  def hash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** 2⁶⁰ as the exactly-representable Double both engines spell as
    * `pow(2.0, 60)` — the hash-normalization denominator. */
  val TwoPow60: Double = math.pow(2.0, 60)

  /** KMV distinct estimate from an ASCENDING hash array column:
    * exact size when the sketch never filled, else (k−1)·2⁶⁰ / h₍ₖ₎ —
    * spelled operand-for-operand like the DuckDB oracle so the Double
    * is bit-identical.
    *
    * k-mismatch guard: a sketch LARGER than `k` was provably built
    * with a different k (e.g. a stored sketch from an older
    * configuration) — estimating it as-is would silently read the
    * wrong order statistic, so that row raises instead. The converse
    * (built with a SMALLER k) is indistinguishable from a sketch that
    * never filled — min-k state carries no k of its own — which is why
    * the registered workflows share one [[DefaultK]] end-to-end. */
  def estimateFromHashes(h: Column, k: Int): Column =
    when(size(h) > k, raise_error(concat(
      lit(s"KMV k mismatch: sketch holds "), size(h).cast("string"),
      lit(s" hashes but the estimator was asked for k=$k"))).cast("double"))
      .when(size(h) < k, size(h).cast("double"))
      .otherwise(
        lit((k - 1).toDouble) * lit(TwoPow60) /
          element_at(h, k).cast("double"))

  /** [[estimateFromHashes]] over a persisted sketch STRUCT column. */
  def estimateDistinct(sk: Column, k: Int): Column =
    estimateFromHashes(sk.getField("hashes"), k)
}
