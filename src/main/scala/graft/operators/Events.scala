package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Scale notes: sessionize is ONE shuffle (hash-partition by user_id) +
  * an in-partition sort; both window functions share the same
  * (partition, order) spec so Catalyst evaluates them in a single
  * Window operator — no second exchange. At 100 TB a skewed power-user
  * key would dominate its partition; AQE skew handling does not apply
  * inside window functions, so pathological keys need a per-user
  * time-bucket pre-split (documented, not needed at test scale).
  */
object Events {

  /** Parse the JSON `props` payload into typed columns (`from_json`
    * with an explicit DDL schema — no inference pass, fixed output
    * shape at any scale). */
  def extractProps(events: DataFrame, ddl: String = "k INT",
      propsCol: String = "props"): DataFrame = {
    val parsed = events.withColumn("_p",
      from_json(col(propsCol), org.apache.spark.sql.types.StructType.fromDDL(ddl)))
    org.apache.spark.sql.types.StructType.fromDDL(ddl).fieldNames
      .foldLeft(parsed)((d, f) => d.withColumn(f, col(s"_p.$f")))
      .drop("_p")
  }

  /** Per-event-type stats over the extracted JSON metric: one
    * partial-aggregated shuffle; avg rounded (merge-order float). */
  def propsAgg(events: DataFrame): DataFrame =
    extractProps(events)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("k")), 6).as("avg_k"))

  /** As-of (backward) join: each left row picks the LATEST right row
    * with the same key and `right.time <= left.time` — the
    * point-in-time lookup (latest price/click/feature before an event)
    * that Spark has no native operator for.
    *
    * Composed scale-first instead of ported: tag both sides, union,
    * and run ONE window per key ordered by (time, tag, right-values)
    * carrying `last(right-values, ignoreNulls)` — a single hash
    * shuffle on the key, an in-partition sort, NO aggregate and NO
    * range-condition join (a naive `l.key = r.key AND r.ts <= l.ts`
    * equi+range join degenerates into per-key cross products at
    * scale). Right rows sort BEFORE left rows at equal timestamps
    * (tag 0 < 1), giving inclusive `<=` semantics; right-side ties on
    * (key, time) are resolved by the value struct itself being the
    * sort's final key — the struct-max right row sorts last, so
    * `last` picks it deterministically under any partitioning (a
    * pre-collapse groupBy(key, time) would cost a SECOND Exchange:
    * its (key, time) hash partitioning cannot serve the window's
    * (key) requirement).
    *
    * Matched right values land in `asof_<col>` columns plus
    * `asof_time` (the matched right timestamp); unmatched left rows
    * keep them null. `toleranceSec` nulls matches older than the
    * window — rows are KEPT (left-join semantics), not dropped. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      rightValueCols: Seq[String],
      toleranceSec: Option[Long] = None): DataFrame = {
    val keys = keyCols.map(col)
    val taggedRight = right
      .select(keys ++ Seq(col(timeCol),
        struct(col(timeCol).as("asof_time") +:
          rightValueCols.map(c => col(c).as(s"asof_$c")): _*)
          .as("_rv")): _*)
      .withColumn("_tag", lit(0))
    val tagged = left.withColumn("_tag", lit(1))
      .unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(timeCol).asc, col("_tag").asc, col("_rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = tagged
      .withColumn("_match", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val bounded = toleranceSec match {
      case Some(tol) => matched.withColumn("_match",
        when(col(timeCol).cast("long") -
          col(s"_match.asof_time").cast("long") <= tol, col("_match")))
      case None => matched
    }
    val outCols = left.columns.toIndexedSeq.map(col) ++
      (("asof_time" +: rightValueCols.map("asof_" + _))
        .map(c => col(s"_match.$c").as(c)))
    bounded.select(outCols: _*)
  }

  /** Retention cohort matrix: users are cohorted by the DAY of their
    * first `cohortType` event; each later active day counts them under
    * (cohort_day, day_offset) — the classic "day-N retention" triangle.
    *
    * Plan: the per-user cohort timestamp is a window min (one shuffle
    * on user_id), the matrix one distinct-count aggregate. The exact
    * `countDistinct` is the oracle path; `approx = true` flips to
    * HyperLogLog++ for the at-scale shape, exactly as
    * [[cardinality]]. */
  def retention(
      events: DataFrame,
      cohortType: String = "signup",
      approx: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val withCohort = events
      .withColumn("cohort_ts",
        min(when(col("event_type") === cohortType, col("ts"))).over(w))
      .filter(col("cohort_ts").isNotNull)
      .withColumn("day_offset",
        datediff(to_date(col("ts")), to_date(col("cohort_ts"))))
      .filter(col("day_offset") >= 0)
    val users =
      if (approx) approx_count_distinct(col("user_id"), rsd)
      else countDistinct(col("user_id"))
    withCohort
      .groupBy(date_format(col("cohort_ts"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"))
      .agg(users.as("n_users"))
  }

  /** Day × event-type count matrix — a pivot written as DIRECT
    * conditional counts rather than `Dataset.pivot`. Both need the
    * explicit type list (a bare `pivot("event_type")` runs a
    * distinct-discovery job over the corpus, and the schema must not
    * depend on which types a slice contains — absent combinations are
    * 0, not a missing column), but `pivot` then plans TWO aggregates
    * (groupBy(day, type) count, then pivot_first over day — two
    * Exchanges), while per-type `count(when(...))` is ONE
    * partial-combined aggregate, the same `COUNT(*) FILTER` shape the
    * SQL twin states. PlanAuditSpec pins the single shuffle. */
  def typePivot(
      events: DataFrame,
      types: Seq[String] =
        Seq("click", "view", "purchase", "signup", "error")): DataFrame = {
    val counts = types.map(t =>
      count(when(col("event_type") === t, 1)).as(t))
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(counts.head, counts.tail: _*)
  }

  /** Two-step conversion funnel: for each user who performed `from` at
    * least once, their FIRST `from` event, their first `to` event AT OR
    * AFTER it, and a 0/1 `converted` flag for conversion within
    * `horizonSec` — the canonical product-analytics funnel query.
    *
    * One logical key (user_id) end to end: the per-user first-`from`
    * timestamp is a window aggregate, the first qualifying `to` a
    * conditional min in the groupBy that follows — both hash-partition
    * on user_id, so Catalyst plans ONE Exchange and the groupBy reuses
    * the window's partitioning. No self-join, no range join; at 100 TB
    * the funnel costs one shuffle of the events table. */
  def funnel(
      events: DataFrame,
      from: String = "click",
      to: String = "purchase",
      horizonSec: Long = 3600L): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val withFirst = events
      .withColumn("first_from",
        min(when(col("event_type") === from, col("ts"))).over(w))
      .filter(col("first_from").isNotNull)
    withFirst
      .groupBy(col("user_id"))
      .agg(
        min(col("first_from")).as("first_from"),
        min(when(col("event_type") === to &&
          col("ts") >= col("first_from"), col("ts"))).as("first_to"))
      .withColumn("converted",
        (col("first_to").isNotNull &&
          unix_micros(col("first_to")) - unix_micros(col("first_from"))
            <= horizonSec * 1000000L).cast("int"))
  }

  /** Cardinality profile per (event_type, day): event count + distinct
    * users — the "how big is each slice really" monitoring query every
    * ingest pipeline runs.
    *
    * Two paths, matching the robust_scaling exact/approx pattern:
    *  - `approx = false` (validation/oracle): `countDistinct`, which
    *    Catalyst plans as a two-phase aggregate (partial distinct on
    *    (group, user), then final count) — exact, but the first phase
    *    keys on group × user, so its shuffle grows with the distinct
    *    count;
    *  - `approx = true` (the 100 TB path): HyperLogLog++
    *    (`approx_count_distinct`, `rsd` relative error) — sketch state
    *    is a fixed few KB per group regardless of user count, fully
    *    map-side combined, ONE shuffle of sketches, mergeable across
    *    days/reruns. At a billion users per day the exact path's
    *    expand-shuffle is the bottleneck; the sketch's is not.
    * EventsSpec pins the approx path inside its error bound against the
    * exact path. */
  def cardinality(
      events: DataFrame,
      approx: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    val users =
      if (approx) approx_count_distinct(col("user_id"), rsd)
      else countDistinct(col("user_id"))
    events
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"), users.as("n_users"))
  }

  /** PERSISTED mergeable distinct-count sketches — the artifact-based
    * complement of [[cardinality]]'s in-query HLL++ path, and the
    * distinct-count analog of `FrequentItems`' persisted Misra-Gries
    * workflow: per-group Apache DataSketches HLL sketch BYTES
    * (`hll_sketch_agg`) that parquet-round-trip and merge across
    * batches (`hll_union_agg`) WITHOUT rescanning history.
    *
    * Why this exists at 100 TB: `countDistinct` re-shuffles every
    * user_id of all time on every refresh; `approx_count_distinct`
    * avoids the shuffle but still rescans history each run. A daily
    * sketch table is a few KB per group per day, and "distinct users
    * this quarter" is a merge over ~90 tiny rows — no history scan at
    * all. Sketches are also partition-order-insensitive: the same
    * union of inputs yields the same estimate under any partitioning
    * (EventsSpec pins merged == one-shot over the whole corpus).
    *
    * `lgK = 14` → rsd ≈ 1.04/√2¹⁴ ≈ 0.8 %; small slices sit in the
    * sketch's exact sparse mode. `n_events` rides along summed so the
    * artifact also answers volume questions exactly. */
  def cardinalitySketch(events: DataFrame, lgK: Int = 14): DataFrame =
    events.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id").cast("string"), lgK).as("sk"),
        count(lit(1)).as("n_events"))

  /** Merge sketch artifacts from [[cardinalitySketch]] (any number of
    * batches, any order) into one row per group with the union
    * estimate. One shuffle of KB-sized sketch rows. */
  def cardinalityMerge(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("event_type"))
      .agg(hll_union_agg(col("sk")).as("sk"),
        sum(col("n_events")).as("n_events"))

  /** Estimate column view of a sketch/merged-sketch frame. */
  def cardinalityEstimate(sketches: DataFrame): DataFrame =
    sketches.select(col("event_type"), col("n_events"),
      hll_sketch_estimate(col("sk")).as("n_users_est"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMinutes`. Emits a per-user
    * 1-based `session_idx` via a running sum over session starts —
    * exactly SQL-window-expressible, so oracle-checkable. */
  /** Next-event transition counts (the first-order Markov view of user
    * journeys): for each user's time-ordered event stream, count
    * (event_type → next event_type) pairs, plus an `__end__` row per
    * user for the final event. The "what do users do after X"
    * analytics every event pipeline ships.
    *
    * One user-keyed window shuffle (lead over (ts, event_id) — the
    * same deterministic ordering sessionize uses) and one
    * partial-aggregated count. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type",
        coalesce(lead(col("event_type"), 1).over(w), lit("__end__")))
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Daily volume anomaly screen: per (event_type, day) counts scored
    * against that type's across-days mean/sample-stddev; |z| past
    * `zThresh` flags the day — the ingest-monitoring query that
    * catches a collapsed producer or a duplication storm. z is rounded
    * to 6dp BEFORE the threshold compare so the flag is engine-stable;
    * types with a single day (stddev undefined) emit z = null,
    * flagged 0.
    *
    * Two aggregations, both tiny: (type, day) counts — calendar-sized,
    * partial-combined — then per-type moments over days. */
  def volumeAnomaly(
      events: DataFrame,
      zThresh: Double = 3.0): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val moments = daily.groupBy(col("event_type"))
      .agg(avg(col("n_events")).as("mu"),
        stddev_samp(col("n_events")).as("sigma"))
    daily.join(moments, "event_type")
      .withColumn("z",
        when(col("sigma") > 0,
          round((col("n_events") - col("mu")) / col("sigma"), 6)))
      .withColumn("is_anomaly",
        (col("z").isNotNull && abs(col("z")) > zThresh).cast("int"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("z"), col("is_anomaly"))
  }

  /** Multi-step ordered funnel: per user, the earliest time of step 1,
    * then the earliest step-2 event AT OR AFTER it, then the earliest
    * step-3 event at or after THAT, and so on — the K-step
    * generalization of [[funnel]] (which this reproduces at K=2 up to
    * output shape). `depth` counts completed steps; `converted` = 1
    * when the final step lands within `horizonSec` of step 1.
    *
    * Scale shape: step 1 is one user-keyed aggregation; each later
    * step joins the (already user-collapsed, one-row-per-user) funnel
    * frame back to that step's events on user_id and re-aggregates —
    * K−1 keyed joins whose left side never exceeds one row per user,
    * so cost stays K × (events shuffle), never combinatorial in event
    * counts (the naive per-user sequence scan is quadratic under
    * repeated steps). All K aggregations partial-combine map-side. */
  def sequenceFunnel(
      events: DataFrame,
      steps: Seq[String],
      horizonSec: Long = 86400L): DataFrame = {
    require(steps.size >= 2, s"need >= 2 steps, got ${steps.size}")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        val carried = col("user_id") +: (1 to i).map(j => col(s"t$j"))
        acc
          .join(events.filter(col("event_type") === step)
            .select(col("user_id"), col("ts").as("_ts")),
            Seq("user_id"), "left")
          .groupBy(carried: _*)
          .agg(min(when(col("_ts") >= col(prev), col("_ts"))).as(cur))
    }
    val ts = (1 to steps.size).map(i => col(s"t$i"))
    val depth = ts.map(t => when(t.isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    full
      .withColumn("depth", depth)
      .withColumn("converted",
        (ts.last.isNotNull &&
          unix_micros(ts.last) - unix_micros(ts.head)
            <= horizonSec * 1000000L).cast("int"))
  }

  /** Per-session summary over [[sessionize]]: one row per (user,
    * session) with bounds, second-truncated duration and event count —
    * the aggregate the streaming twin
    * ([[graft.streaming.StreamOps.sessionizeStream]]) maintains live.
    * Costs NOTHING beyond sessionize's one user-keyed window shuffle:
    * the (user_id, session_idx) groupBy's clustering requirement is
    * already satisfied by the window's hash partitioning on user_id
    * (user_id is a subset of the grouping key), so Catalyst plans the
    * aggregation WITHOUT a second Exchange. */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_sec",
        col("session_end").cast("long") - col("session_start").cast("long"))

  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapSec = col("ts").cast("long") -
      lag(col("ts"), 1).over(byUser).cast("long")
    val isNew = when(gapSec.isNull || gapSec > gapMinutes * 60L, 1).otherwise(0)
    events
      .withColumn("is_new", isNew)
      .withColumn("session_idx", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("event_id", "user_id", "ts", "session_idx")
  }

  /** Trailing time-RANGE rolling aggregates per event — the moving
    * 1-hour volume/value monitor, and the registry's RANGE-frame
    * coverage (every other window row is ROWS/growing-frame): for
    * each event, the count and 6dp value sum of its type's events in
    * the preceding `windowSec` (inclusive, peers included — RANGE
    * semantics both engines share on the integer epoch-µs key, so
    * frames are exact). One window shuffle keyed by type; the frame
    * slides in event-time order with no second pass. */
  def rollingWindow(events: DataFrame, windowSec: Long = 3600L): DataFrame = {
    require(windowSec > 0, s"rollingWindow: windowSec must be > 0")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("t"))
      .rangeBetween(-windowSec * 1000000L, 0L)
    events.select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("value"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window", round(sum(col("value")).over(w), 6))
      .select("event_id", "event_type", "t", "n_window", "sum_window")
  }

  /** 6dp half-up rounding spelled as pure IEEE arithmetic —
    * floor(x·10⁶ + 0.5)/10⁶ — IDENTICALLY restatable in DuckDB.
    * PageRank iterates on short-rational values (sums of n/W edge
    * shares), exactly the regime where Spark's BigDecimal `round` and
    * DuckDB's multiply-then-round can disagree on a half boundary;
    * this form cannot (Spark `floor` returns long — the division by
    * the double literal re-widens). */
  private def floor6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** Weighted PageRank over the event-transition graph — the
    * crawl-prioritization / canonical-source ranking shape (Page et
    * al., 1999), in GraphX `staticPageRank` semantics (public,
    * org.apache.spark.graphx.lib.PageRank): unnormalized ranks,
    * `pr₀(v) = 1`, `prₜ₊₁(v) = 0.15 + d·Σ_{u→v} prₜ(u)·w(u,v)/W(u)`,
    * no dangling-mass redistribution — which keeps every iteration a
    * pure edge-list join with NO driver-side scalar in the loop.
    * Edges are [[transitions]] counts with the `__end__` sink dropped;
    * edge weight share w/W is the observed next-step probability.
    *
    * The fixed `iters` steps are UNROLLED (the kmeans_lloyd / BPE
    * oracle treatment): each step's ranks are 6dp-floor-rounded before
    * feeding the next, so both engines iterate on bit-identical
    * inputs and the full trajectory (pr_1..pr_iters columns) is
    * hash-exact under the oracle.
    *
    * Scale shape: deriving edges is the corpus-scale work (one
    * user-keyed window + one partial-aggregated count); each iteration
    * is one rank⋈edge join + one partial-aggregated groupBy on the
    * GRAPH (edges/nodes), never the raw events — the Pregel shape, and
    * at web-graph scale the join key is the vertex id on both sides so
    * a shared pre-partitioning serves all iterations. */
  def pageRank(events: DataFrame, damping: Double = 0.85,
      resetProb: Double = 0.15, iters: Int = 3): DataFrame = {
    val edges = transitions(events)
      .filter(col("next_type") =!= "__end__")
      .withColumnRenamed("event_type", "src")
      .withColumnRenamed("next_type", "dst")
    // nodes from EVENTS, not edges: an event type that only ever ends
    // sessions has no out- or in-edge but still ranks (at resetProb)
    val nodes = events.select(col("event_type").as("node")).distinct()
    pageRankOnEdges(edges, nodes, damping, resetProb, iters)
      .withColumnRenamed("node", "event_type")
  }

  /** [[pageRank]]'s iteration over an EXPLICIT weighted edge list —
    * the corpus-scale seam (r16, r15 verdict item 5): the events
    * variant proves the arithmetic on a ~5-vertex transition graph;
    * this one runs the identical Pregel-shaped loop over any
    * `(src, dst, n)` frame — the registered corpus row feeds it the
    * image near-dup relation (thousands of vertices at sf0.1+),
    * symmetrized, so iteration cost is measured against |edges|, not
    * a toy. Each step is one rank⋈edge equi-join + one
    * partial-aggregated groupBy on the GRAPH; the join key is the
    * vertex id on both sides, so one pre-partitioning serves all
    * iterations at web-graph scale. `nodes` is explicit because the
    * vertex universe is the caller's contract (isolated vertices rank
    * at `resetProb` forever but never emerge from an edge list).
    *
    * FIXED-POINT iteration (r16): ranks travel as micro-rank BIGINTs
    * (`pri = round(pr·10⁶)`), each edge contributes
    * `floor(pri·n/w_out)` micro-units, and the per-vertex mass is an
    * INTEGER sum — associative, so partial aggregation order (and any
    * other engine's summation order) cannot move it. The toy-graph
    * double recipe broke at corpus scale: multi-term mass sums of
    * 6dp-rounded ranks are exact short decimals that land ON the 6dp
    * half boundary, where cross-engine summation order flips the
    * round (measured: 2 of 238 rows at sf0.01). All remaining double
    * arithmetic (`0.15 + 0.85·mass/10⁶`, then the 6dp floor back to
    * micro-units) is a single spelled expression over bit-identical
    * integer inputs — deterministic in every engine, boundary or not.
    * Semantics are GraphX staticPageRank modulo the per-edge
    * micro-unit floor (error < degree·10⁻⁶ per step — the same order
    * as the 6dp trajectory rounding itself). */
  def pageRankOnEdges(edges: DataFrame, nodes: DataFrame,
      damping: Double = 0.85, resetProb: Double = 0.15,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    // resetProb is a SEPARATE literal, not 1−damping: the SQL oracle
    // spells `0.15 + 0.85·mass`, and double(0.15) ≠ 1.0−double(0.85)
    // (they differ in the last ulp) — both engines must start from
    // the same decimal-literal-converted doubles.
    require(math.abs(damping + resetProb - 1.0) < 1e-9,
      s"pageRank: damping $damping + resetProb $resetProb must sum to 1")
    val outW = edges.groupBy(col("src")).agg(sum(col("n")).as("w_out"))
    val weighted = edges.join(outW, "src")
    val start = nodes.withColumn("pri_0", lit(1000000L))
    (1 to iters).foldLeft(start) { (acc, t) =>
      val prev = col(s"pri_${t - 1}")
      val contrib = acc.join(weighted, acc("node") === weighted("src"))
        .groupBy(col("dst").as("node_in"))
        // floor(pri·n / w_out): long·long stays well under 2^53, so
        // the double division is exact and the floor deterministic;
        // the SUM is pure BIGINT — order-independent
        .agg(sum(floor(prev * col("n") / col("w_out")).cast("long"))
          .as("mass"))
      acc.join(contrib, acc("node") === contrib("node_in"), "left")
        .withColumn(s"pri_$t",
          floor((lit(resetProb) + lit(damping) *
              (coalesce(col("mass"), lit(0L)) / lit(1000000.0))) *
              lit(1000000.0) + lit(0.5))
            .cast("long"))
        .drop("node_in", "mass")
    }.select(col("node") +:
      (0 to iters).map(t =>
        (col(s"pri_$t") / lit(1000000.0)).as(s"pr_$t")): _*)
  }
}
