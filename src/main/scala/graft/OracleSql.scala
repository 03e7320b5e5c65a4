package graft

/** The DuckDB-oracle SQL side of the driver contract — the single map
  * [[Verify]] dumps, assembled from the per-family registries (r15
  * verdict item 7: the single-file layout passed 4,500 lines). Every
  * key mirrors a [[SparkEntry.queries]] registration with IDENTICAL
  * column names/aliases; shared CTE constants live in
  * [[OracleSqlShared]] so each arithmetic derivation is stated exactly
  * once across the twins that reuse it. Family maps are key-disjoint
  * (asserted in VerifySpec) so the concatenation order is immaterial. */
private[graft] object OracleSql {

  // Families contribute Seqs of pairs, not Maps (r17 advice #5): a Map
  // literal collapses a duplicate key WITHIN one family by last-wins
  // before any disjointness check can see it; as Seqs every
  // registration survives to the require below.
  private[graft] val familyEntries: Seq[Seq[(String, String)]] = Seq(
    OracleSqlFeatures.entries, OracleSqlRelational.entries,
    OracleSqlDedup.entries, OracleSqlCurate.entries,
    OracleSqlText.entries, OracleSqlSimilarity.entries,
    OracleSqlMultimodal.entries, OracleSqlEvents.entries)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val all: Map[String, String] = {
    val flat = familyEntries.flatten
    val dup = flat.map(_._1)
      .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty,
      s"oracle keys registered more than once (within or across " +
        s"families): ${dup.toSeq.sorted.mkString(", ")}")
    flat.toMap
  }

  /** Sum of the family registration counts — equal to `all.size` iff
    * every key is registered exactly once (pinned in VerifySpec, so a
    * duplicated key cannot silently drop an oracle). */
  val familySizeSum: Int = familyEntries.map(_.size).sum
}
