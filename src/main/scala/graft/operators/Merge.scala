package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge (MERGE INTO semantics) for snapshot maintenance — the
  * operation a mutable 100 TB corpus needs between full rebuilds:
  * apply a (much smaller) batch of upserts and deletes to the previous
  * snapshot and emit the next snapshot.
  *
  * Formulated as union + keyed window instead of a full-outer join:
  * tag target rows priority 0 and update rows priority 1, keep the
  * max-priority row per key, then drop rows whose winning version is a
  * delete. That is ONE hash shuffle on the key (vs. the outer join's
  * two-sided shuffle plus a coalesce projection per column), and the
  * rank-1 window gets Spark's map-side WindowGroupLimit, so each
  * partition forwards at most one candidate per (key, priority) — at
  * scale the shuffle carries ~|target| + |updates| rows once, nothing
  * quadratic and no second pass.
  *
  * Contract (same as ANSI MERGE): `updates` must have at most ONE row
  * per key — duplicate source matches make MERGE nondeterministic, and
  * ANSI raises an error for them. We document rather than pay a
  * corpus-wide distinct-count to enforce it; [[upsertStrict]] is the
  * enforcing variant for when the updates batch is untrusted.
  */
object Merge {

  /** Apply `updates` to `target`: rows in `updates` replace target rows
    * with the same `key`, new keys are inserted, and rows whose
    * `deleteCol` (if present in `updates`) is true delete the target
    * row. Both frames must share the data schema (minus `deleteCol`).
    */
  def upsert(
      target: DataFrame,
      updates: DataFrame,
      key: String,
      deleteCol: Option[String] = None): DataFrame = {
    val dataCols = target.columns.toSeq
    val del = deleteCol match {
      case Some(c) => col(c)
      case None    => lit(false)
    }
    val tagged = target
      .select(dataCols.map(col): _*)
      .withColumn("_del", lit(false))
      .withColumn("_pri", lit(0))
      .unionByName(
        updates
          .withColumn("_del", del)
          .select((dataCols :+ "_del").map(col): _*)
          .withColumn("_pri", lit(1)))
    val w = Window.partitionBy(col(key)).orderBy(col("_pri").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_del"))
      .select(dataCols.map(col): _*)
  }

  /** [[upsert]] plus the ANSI duplicate-source-match check: fails the
    * job if `updates` carries more than one row for any key. Costs one
    * extra aggregation over the (small) updates batch only — the
    * target snapshot is never touched by the check. */
  def upsertStrict(
      target: DataFrame,
      updates: DataFrame,
      key: String,
      deleteCol: Option[String] = None): DataFrame = {
    val dupCheck = updates.groupBy(col(key)).count()
      .filter(col("count") > 1).limit(1).collect()
    require(dupCheck.isEmpty,
      s"updates batch has duplicate rows for key ${dupCheck.headOption.map(_.get(0))} — MERGE requires at most one source row per key")
    upsert(target, updates, key, deleteCol)
  }

  /** Slowly-changing-dimension TYPE 2 history from a change log — the
    * other half of CDC maintenance: [[upsert]] produces the CURRENT
    * snapshot, `scd2` produces the full VERSION HISTORY (one row per
    * distinct run of attribute values per key, with its validity
    * interval) that point-in-time joins and audits need.
    *
    * `changes` is an append-only change log (key, seq, attributes…).
    * Rows are totally ordered within a key by (`seqCol`,
    * `tieBreak`…) — pass a tie-break (e.g. a change id) whenever two
    * changes can share a sequence value, or interval bounds are
    * nondeterministic. Consecutive rows whose `attrCols` are unchanged
    * are SUPPRESSED (no-op updates open no new version — null-safe
    * struct comparison, so a null attribute equals itself); each
    * surviving row opens a version valid from its own seq until the
    * next surviving row's seq (`valid_to` null = current version).
    * Deletions in SCD2 are represented in-log as a change TO a
    * tombstone attribute value, which closes the prior version and
    * opens a tombstone version like any other change.
    *
    * Scale shape: ONE hash shuffle on the key — both window passes
    * (the lag that suppresses no-ops, the lead that closes intervals)
    * share the same (partition, order) spec, and the filter between
    * them preserves distribution and order, so Catalyst plans a
    * single Exchange + sort feeding both Window operators
    * (PlanAuditSpec-checkable). Nothing driver-side, nothing
    * quadratic; output is bounded by the change log itself. */
  def scd2(
      changes: DataFrame,
      key: String,
      seqCol: String,
      attrCols: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one attribute column")
    val order = (col(seqCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val attrs = struct(attrCols.map(col): _*)
    val opened = changes
      .withColumn("_chg", !(attrs <=> lag(attrs, 1).over(w)))
      .filter(col("_chg"))
    opened
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .select(col(key) +: attrCols.map(col) :+
        col(seqCol).as("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.cast("int").as("is_current"): _*)
  }

  /** Incremental [[scd2]] maintenance — the nightly shape: fold a new
    * batch of changes into an EXISTING history without replaying the
    * full change log. The history's own rows are re-read as
    * pseudo-changes at their `valid_from` (each history row IS the
    * surviving change that opened it — the no-ops [[scd2]] suppressed
    * are exactly the rows that cannot affect any later interval), the
    * new batch is unioned in, and [[scd2]] re-derives intervals; the
    * result is row-identical to `scd2(full log)`.
    *
    * PRECONDITION (documented, not paid for with a corpus-wide check —
    * the [[upsert]] duplicate-contract precedent): every new change's
    * seq must be LATER than all history seqs for its key (an
    * append-only CDC cursor — the normal case). A change arriving
    * retroactively BEFORE a suppressed no-op would need that no-op
    * back (it stops being a no-op once something interleaves), and
    * compaction has dropped it — replay the full log for backfills.
    * Seqs must also be distinct per key (the history no longer carries
    * tie-break columns).
    *
    * Scale shape: identical to [[scd2]] — ONE hash shuffle on the key
    * over |history| + |batch| rows; history is the COMPACTED log
    * (no-ops gone), so nightly cost tracks the version count, not the
    * raw change volume. */
  def scd2Incremental(
      history: DataFrame,
      changes: DataFrame,
      key: String,
      seqCol: String,
      attrCols: Seq[String]): DataFrame = {
    val histLog = history.select(
      col(key) +: attrCols.map(col) :+ col("valid_from").as(seqCol): _*)
    val newLog = changes.select(
      col(key) +: attrCols.map(col) :+ col(seqCol): _*)
    scd2(histLog.unionByName(newLog), key, seqCol, attrCols)
  }

  /** Snapshot DIFF report (r15) — the AUDIT complement of [[upsert]]:
    * given the previous and current corpus snapshots, classify every
    * key as `added` / `removed` / `changed` / `unchanged`. What a
    * dataset-versioning pipeline runs after a refresh, before
    * committing it: "this rebuild touched 0.3 % of docs" is a
    * diff-report fact, and an unexpected `removed` spike is the
    * classic bad-refresh alarm.
    *
    * Change detection compares an md5 fingerprint of `compareCols`
    * (cast to string, joined on a \u0001 separator — restatable in any
    * engine; both engines' concat_ws SKIPS null arguments, so a null
    * is indistinguishable from an empty string inside the fingerprint
    * — pass pre-coalesced columns if that distinction matters).
    *
    * Scale shape: each side is projected to (key, fingerprint) BEFORE
    * the one full-outer hash join — the shuffle carries two narrow
    * columns per row, never document payloads, so the diff costs two
    * fingerprint scans plus a key-shuffle of hashes regardless of row
    * width. */
  def snapshotDiff(
      prev: DataFrame,
      curr: DataFrame,
      key: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    def fingerprints(df: DataFrame, as: String) = df.select(col(key),
      md5(concat_ws("\u0001",
        compareCols.map(c => col(c).cast("string")): _*)).as(as))
    // concat_ws never returns null, so a null fingerprint marks a
    // join miss — no separate presence flag needed
    fingerprints(prev, "fp_prev")
      .join(fingerprints(curr, "fp_curr"), Seq(key), "full_outer")
      .select(col(key),
        when(col("fp_prev").isNull, "added")
          .when(col("fp_curr").isNull, "removed")
          .when(col("fp_prev") === col("fp_curr"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
