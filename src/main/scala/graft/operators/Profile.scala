package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the `SUMMARIZE` / `df.describe()` data-
  * quality primitive the reference's notebook users run before every
  * `load_sample_data` (`/root/reference/spark_ml_features_local.py:36-45`
  * eyeballs the loaded frame with `show()`; this is that step made
  * queryable): per column, row count, null count, distinct count and
  * min/max, emitted as one row per column.
  *
  * Two paths, one output shape:
  *  - [[profile]] — EXACT distinct counts. Catalyst plans n distinct
  *    aggregates as ONE Expand (each input row replicated once per
  *    profiled column) feeding a single partial+final aggregate pair,
  *    so the job stays one scan + one shuffle — but that shuffle
  *    carries rows × columns. VALIDATION-SCALE path: it exists to be
  *    oracle-comparable bit-for-bit (DuckDB `count(DISTINCT …)`).
  *  - [[profileApprox]] — the 100 TB default. HyperLogLog++
  *    (`approx_count_distinct`) replaces the exact distincts, which
  *    collapses the plan to a plain partial+final aggregate over the
  *    un-expanded scan: constant state per column per task, no
  *    row-multiplication, one row out per column. rsd defaults to 5%,
  *    the Spark built-in default.
  *
  * min/max are CAST to string AFTER aggregating (n typed extrema, not
  * n typed columns in the output), so heterogeneous tables profile
  * into one frame. All stats tolerate full-null columns (count=0,
  * min/max null).
  */
object Profile {

  /** Exact profile of `cols`: one output row per column, columns
    * `(column_name, n_rows, n_nulls, n_distinct, min_val, max_val)`.
    * One scan, one Expand-fed aggregate; see scale note above. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    assemble(df, cols, exact = true)

  /** HLL++ profile — identical shape, `n_distinct` is the
    * `approx_count_distinct` estimate. No Expand: the at-scale path. */
  def profileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame =
    assemble(df, cols, exact = false, rsd)

  /** Fixed-width histogram of a numeric column: `nBins` equal-width
    * buckets over the column's exact [min, max], emitting
    * (bin_id, lo, hi, n) with empty bins PRESENT (count 0) — the
    * distribution-shape profiling step next to [[profile]]'s scalar
    * stats. The max value lands in the LAST bin (half-open buckets,
    * closed at the top).
    *
    * Determinism: bounds come from exact MIN/MAX aggregates; the
    * bucket index is floor((x−min)/width) — single IEEE ops on
    * engine-identical operands, so the assignment is reproducible
    * anywhere (no summation anywhere in the path). `lo`/`hi` are
    * rounded to 6dp for the report only; assignment uses the raw
    * arithmetic.
    *
    * Scale: one min/max aggregate (fixed-size state), then one
    * partial-combined count keyed by bin — output is `nBins` rows
    * regardless of input size; the bin spine is a driver-side range
    * so empty bins cost nothing. Nulls are excluded (they are
    * [[profile]]'s `n_nulls` business, not a bucket). */
  def histogram(
      df: DataFrame,
      column: String,
      nBins: Int = 20): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val x = col(column).cast("double")
    val b = df.where(x.isNotNull)
      .agg(min(x).as("mn"), max(x).as("mx")).head()
    require(!b.isNullAt(0), s"histogram: column '$column' is all null")
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    val width = (mx - mn) / nBins
    val spark = df.sparkSession
    import spark.implicits._
    // half-away-from-zero at 6dp — the ROUND convention DuckDB and
    // Spark's `round` share (rint's half-even would diverge on exact
    // .5e-6 boundaries)
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val spine = (0 until nBins).map(i => (i,
      r6(mn + i * width), r6(mn + (i + 1) * width)))
      .toDF("bin_id", "lo", "hi")
    val binned =
      if (width == 0) df.where(x.isNotNull).select(lit(0).as("bin_id"))
      else df.where(x.isNotNull).select(
        least(lit(nBins - 1),
          floor((x - lit(mn)) / lit(width)).cast("int")).as("bin_id"))
    spine.join(
      binned.groupBy("bin_id").agg(count(lit(1)).as("n")),
      Seq("bin_id"), "left")
      .select(col("bin_id"), col("lo"), col("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Equi-DEPTH histogram of a numeric column: `nBins` buckets cut at
    * the exact `i/nBins` quantiles, emitting per bucket
    * `(bin_id, n, min_val, max_val)` — the distribution profile that
    * stays informative under heavy skew, where [[histogram]]'s
    * equal-width buckets collapse into one hot bin and n−1 empties.
    *
    * Bin rule: `bin = 1 + Σᵢ (x > qᵢ)` over the nBins−1 interior cut
    * points — half-open `(qᵢ₋₁, qᵢ]` buckets, ties at a cut all land
    * in the lower bucket (so bins are only approximately equal-sized
    * under ties; that is the standard equi-depth contract).
    *
    * Determinism across engines: the cuts are exact percentiles
    * (linear interpolation at pos = f·(n−1); computed by
    * [[exactPercentiles]], bit-identical to the `percentile`
    * aggregate). Fed an INTEGER-VALUED column (counts, cents,
    * epoch seconds — the profiling domains), every interpolated cut
    * is an integer multiple of 1/nBins and therefore EXACT in IEEE
    * double on any engine and any summation order, for any
    * power-of-two `nBins` — the comparison `x > qᵢ` can never flip on
    * an ulp. (Fractional inputs profile fine too; only cross-engine
    * bit-parity needs the integer domain.)
    *
    * Two paths, one shape (the [[graft.features.RobustScaling]] Q5
    * convention): `exact = true` runs the distributed-CDF exact
    * percentile — the oracle-parity validation path; `exact = false`
    * swaps in Greenwald–Khanna `approxQuantile` (bounded sketch
    * state, no distinct-scale step) — the 100 TB default for
    * high-cardinality columns. Either way the cuts are a BOUNDED
    * driver artifact (nBins−1 doubles) baked into the second pass as
    * plan literals, so the binning pass is a pure narrow projection
    * feeding an nBins-row aggregate: one scan, fixed-size state, no
    * row-multiplication, no global sort of the data. */
  def equidepth(
      df: DataFrame,
      column: String,
      nBins: Int = 8,
      exact: Boolean = true,
      relErr: Double = 1e-4): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val x = col(column).cast("double")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val nn = df.where(x.isNotNull)
    val cuts: Seq[Double] =
      if (exact) exactPercentiles(df, column, probs)
      else nn.stat.approxQuantile(column, probs.toArray, relErr).toSeq
    val bin = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(x > lit(c), 1).otherwise(0)
    }
    nn.select(bin.as("bin_id"), x.as("x"))
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n"), min(col("x")).as("min_val"),
        max(col("x")).as("max_val"))
  }

  /** Exact percentiles via a distributed CDF instead of the built-in
    * `percentile` aggregate, BIT-IDENTICAL results (same
    * `a + (b−a)·frac` interpolation at pos = f·(n−1) over the sorted
    * multiset — asserted against `percentile` in ProfileSpec and by
    * the profile_equidepth DuckDB oracle end-to-end).
    *
    * Why not the built-in: Catalyst's `Percentile` carries a
    * value→count OpenHashMap of EVERY distinct value as one opaque
    * aggregation buffer — partials serialize whole maps to the single
    * final reducer, which merges then sorts them on one thread (and
    * ~2× slower than this plan already at sf0.1's 583 k distinct
    * cents). Here the heavy lifting is a plain codegen'd
    * `groupBy(value).count()` — distributed, partial-aggregated,
    * spillable — after which only the DISTINCT frame (narrow
    * (value, cnt) rows, not a map blob) flows into a streaming
    * running-sum window; the interpolation neighbors are filtered out
    * by literal rank predicates (≤ 2·|probs| rows collected) and the
    * arithmetic finishes on the driver. Both formulations are
    * distinct-bounded at the final step — the honest 100 TB default
    * for high-cardinality columns stays Greenwald–Khanna
    * (`exact = false` above); this is the oracle-parity path made
    * ~2× cheaper and spill-safe. */
  private[operators] def exactPercentiles(
      df: DataFrame,
      column: String,
      probs: Seq[Double]): Seq[Double] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0,1], got $probs")
    val x = col(column)
    val nn = df.where(x.isNotNull)
    // n = Σ cnt rides the SAME single aggregation job that computes
    // the bucket map's extrema over the distinct frame — previously a
    // separate full `nn.count()` corpus scan (fused per the r12
    // verdict: ~one corpus pass recovered, roughly halving the sf0.1
    // profile_equidepth regression the two-phase CDF introduced)
    // r18 optimization: the distinct frame feeds TWO consumers — the
    // fused (n, extrema) aggregate and the CDF's bucket/window phases —
    // and without materialization each re-ran the corpus-wide
    // groupBy(value) scan (two identical ~4 MB map-side shuffle writes
    // in the sf0.1 profile). One localCheckpoint of the
    // distinct-bounded (v, cnt) frame replaces the second corpus pass
    // with a block replay; still distinct-bounded at 100 TB (the same
    // bound the CDF design already carries).
    val counts = distinctCounts(nn, x).localCheckpoint(true)
    val (n, mn, mx) = countsStats(counts)
    require(n > 0, s"exactPercentiles: column '$column' is all null")
    // 0-indexed ranks of each cut's interpolation neighbors
    val ranks = probs.flatMap { f =>
      val lo = math.floor(f * (n - 1)).toLong
      Seq(lo, math.min(lo + 1, n - 1))
    }.distinct
    val cum = cdfFromCounts(counts, mn, mx)
    // rank r lives in the row with cum − cnt <= r < cum
    val hit = ranks.map(r =>
      col("cum") - col("cnt") <= lit(r) && col("cum") > lit(r))
      .reduce(_ || _)
    val rows = cum.where(hit)
      .select(col("v").cast("double"), col("cum"), col("cnt")).collect()
    val atRank = ranks.map(r => r -> rows.find(row =>
      row.getLong(1) - row.getLong(2) <= r && r < row.getLong(1))
      .getOrElse(sys.error(s"rank $r not covered — CDF logic broken"))
      .getDouble(0)).toMap
    probs.map { f =>
      val pos = f * (n - 1)
      val lo = math.floor(pos).toLong
      val a = atRank(lo)
      val b = atRank(math.min(lo + 1, n - 1))
      a + (b - a) * (pos - lo)
    }
  }

  /** The distinct-value CDF `(v, cnt, cum)` under [[exactPercentiles]]
    * — `cum` is the running count of the sorted value multiset at each
    * distinct value's upper edge. Round 12: the running sum is now a
    * TWO-PHASE bucket prefix-sum instead of a global `orderBy` window,
    * which planned as a SinglePartition sort of the whole distinct
    * frame — fine at fixture scale, a one-thread bottleneck on a
    * high-cardinality column at 100 TB (the same defect the r8
    * `llm_global_shuffle` fix removed, reused here):
    *
    *  1. bucket = an ORDER-PRESERVING affine map of the value into
    *     2^16 range buckets (monotone: v1 < v2 ⇒ bkt(v1) ≤ bkt(v2)).
    *     Bucket COUNT subtotals cumulate into bucket offsets — that
    *     window is partition-less but its input is ≤ 65536 rows
    *     regardless of corpus size, driver-scale by construction.
    *  2. cum = (broadcast) bucket offset + within-bucket running sum,
    *     where the window partitions by bucket — 65536-way parallel.
    *
    * Correctness needs only MONOTONICITY of the bucket map, never
    * balance: a skewed value domain degrades parallelism back toward
    * the old single-partition shape, it cannot change `cum`. Extrema
    * are taken over the DISTINCT frame (already aggregated — no extra
    * corpus pass); non-finite domains (±Inf spread, or min == max)
    * fall back to one bucket, and NaN — which Spark sorts above every
    * double — maps above every finite bucket, preserving the global
    * sort order the old window used. ProfileSpec pins bit-parity vs
    * the built-in `percentile` and the two-window plan shape. */
  private[operators] def distinctCdf(
      nn: DataFrame,
      x: org.apache.spark.sql.Column): DataFrame = {
    val counts = distinctCounts(nn, x)
    val (_, mn, mx) = countsStats(counts)
    cdfFromCounts(counts, mn, mx)
  }

  /** The distinct-value `(v, cnt)` frame both CDF phases aggregate
    * over — one codegen'd corpus scan, partial-aggregated, spillable. */
  private def distinctCounts(
      nn: DataFrame, x: org.apache.spark.sql.Column): DataFrame =
    nn.groupBy(x.as("v")).agg(count(lit(1)).as("cnt"))

  /** ONE aggregation job over the distinct frame returning (n = Σ cnt,
    * finite min, finite max) — the row count and the bucket-map
    * extrema fused so [[exactPercentiles]] needs no separate corpus
    * `count()` scan. NaN values count toward n (they are sortable —
    * above every finite double) but are excluded from the extrema,
    * matching the old separate-jobs behavior. */
  private def countsStats(counts: DataFrame): (Long, Double, Double) = {
    val vd = col("v").cast("double")
    val r = counts.agg(
      coalesce(sum("cnt"), lit(0L)).as("n"),
      min(when(!isnan(vd), vd)).as("mn"),
      max(when(!isnan(vd), vd)).as("mx")).head()
    if (r.isNullAt(1)) (r.getLong(0), 0.0, 0.0)
    else (r.getLong(0), r.getDouble(1), r.getDouble(2))
  }

  private def cdfFromCounts(
      counts: DataFrame, mn: Double, mx: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vd = col("v").cast("double")
    val spreadFinite = !mn.isInfinite && !mx.isInfinite && mx > mn
    val bkt =
      if (spreadFinite)
        when(isnan(vd), lit(65536L)).otherwise(
          least(floor((vd - lit(mn)) / lit(mx - mn) * 65536).cast("long"),
            lit(65535L)))
      else when(isnan(vd), lit(65536L)).otherwise(lit(0L))
    val withBkt = counts.withColumn("bkt", bkt)
    val offsets = withBkt.groupBy("bkt").agg(sum("cnt").as("bcnt"))
      .withColumn("off",
        coalesce(sum("bcnt").over(
          Window.orderBy("bkt").rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .select("bkt", "off")
    val w = Window.partitionBy("bkt").orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBkt.join(broadcast(offsets), "bkt")
      .withColumn("cum", col("off") + sum(col("cnt")).over(w))
      .select("v", "cnt", "cum")
  }

  private def assemble(df: DataFrame, cols: Seq[String], exact: Boolean,
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n_rows"), aggs: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"),
        col(s"__mx_$c").as("max_val"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** Population-stability-index drift between the FIRST and SECOND
    * time halves of a measure column — the distribution-drift monitor
    * (the credit-scoring PSI applied to ingest QA): 10 equi-width
    * bins over the global [min, max], per-half shares, and
    * `psi_term = (p_a' − p_b')·ln(p_a'/p_b')` with both shares
    * floored at `eps` so an empty bin contributes a large-but-finite
    * term instead of ±∞ (the standard PSI smoothing). Rule of thumb:
    * Σ < 0.1 stable, > 0.25 drifted — `psi_total` rides on every row.
    *
    * Determinism: the time split is integer epoch-µs arithmetic
    * (`lo + (hi−lo)/2`, exact in both engines); bin edges divide
    * exact min/max doubles in a spelled order; every bin 0..9 emits a
    * row even when empty (a literal bin spine LEFT JOINs the counts).
    * Two fixed-size aggregates (global stats, then per-(half, bin)
    * counts at ≤ 20 cells) — nothing driver-side scales with data. */
  def psiDrift(
      df: DataFrame,
      valueCol: String,
      tsCol: String = "ts",
      nBins: Int = 10,
      eps: Double = 0.0001): DataFrame = {
    require(nBins >= 2, s"psiDrift needs >= 2 bins, got $nBins")
    val base = df.select(col(valueCol).cast("double").as("v"),
        unix_micros(col(tsCol)).as("t"))
      .filter(col("v").isNotNull && col("t").isNotNull)
    val stats = base.agg(min(col("v")), max(col("v")),
      min(col("t")), max(col("t"))).head()
    val (vMin, vMax) = (stats.getDouble(0), stats.getDouble(1))
    val (tLo, tHi) = (stats.getLong(2), stats.getLong(3))
    val tMid = tLo + (tHi - tLo) / 2
    // Degenerate-time guard (ADVICE r15): if every row shares one
    // timestamp, tMid == tLo and the first half is EMPTY — tot_a = 0
    // and n/0.0 yields NaN, which greatest(NaN, eps) propagates (NaN
    // wins) into psi_total, a silent cross-engine divergence. tHi > tLo
    // guarantees both halves non-empty: min(t) = tLo < tMid fills the
    // first, max(t) = tHi >= tMid the second.
    require(tLo < tHi,
      s"psiDrift: '$tsCol' is constant — cannot split halves for drift")
    val width = (vMax - vMin) / nBins.toDouble
    require(width > 0.0, s"psiDrift: constant '$valueCol' has no bins")
    val bin = least(lit(nBins - 1),
      floor((col("v") - lit(vMin)) / lit(width)).cast("int"))
    val counts = base
      .select(bin.as("bin"), (col("t") < lit(tMid)).as("first_half"))
      .groupBy(col("bin"))
      .agg(count(when(col("first_half"), lit(1))).as("n_a"),
        count(when(!col("first_half"), lit(1))).as("n_b"))
    val spark = df.sparkSession
    val spine = spark.range(nBins).select(col("id").cast("int").as("bin"))
    val full = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // totals via a 1×nBins cross of the fixed-size sums row — the
    // Sketches 1×1 pattern, and the shape the oracle restates
    val totals = full.agg(sum(col("n_a")).as("tot_a"),
      sum(col("n_b")).as("tot_b"))
    val pA = greatest(col("n_a").cast("double") / col("tot_a").cast("double"),
      lit(eps))
    val pB = greatest(col("n_b").cast("double") / col("tot_b").cast("double"),
      lit(eps))
    import org.apache.spark.sql.expressions.Window
    full.crossJoin(totals)
      .withColumn("term", (pA - pB) * log(pA / pB))
      .withColumn("p_a", round(pA, 6))
      .withColumn("p_b", round(pB, 6))
      .withColumn("psi_term", round(col("term"), 6))
      .withColumn("psi_total",
        round(sum(col("term")).over(Window.partitionBy()), 6))
      .select("bin", "n_a", "n_b", "p_a", "p_b", "psi_term", "psi_total")
  }

  /** Join/aggregation-key skew profile — the number the salting
    * decision is made from BEFORE a 100 TB shuffle, not after it
    * stragglers: per-key counts (one partial-aggregated shuffle over
    * the key domain), then `skew_ratio = max/avg` plus the top-1 /
    * top-10 mass shares. A ratio near 1 says hash partitioning will
    * balance; 100× says the hot keys need salt (operators.Skew) or
    * AQE skew-join. The top-10 leg plans TakeOrderedAndProject
    * (distributed partial top-k); everything else folds to one
    * fixed-size stats row. NULL keys are excluded (they never join).
    *
    * All inputs are exact integer counts; the three derived doubles
    * divide them in a spelled order the oracle mirrors, 6dp. */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val top10 = counts
      .orderBy(col("cnt").desc, col(keyCol)).limit(10)
      .agg(sum(col("cnt")).as("top10_cnt"))
    val stats = counts.agg(
      sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("cnt")).as("max_cnt"))
    stats.crossJoin(top10) // 1×1 of fixed-size stats rows
      .select(
        col("n_rows"), col("n_keys"), col("max_cnt"),
        round(col("max_cnt").cast("double") / col("n_rows").cast("double"),
          6).as("top1_share"),
        round(col("top10_cnt").cast("double") / col("n_rows").cast("double"),
          6).as("top10_share"),
        round(col("max_cnt").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")),
          6).as("skew_ratio"))
  }
}
