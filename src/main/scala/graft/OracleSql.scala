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

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  val all: Map[String, String] =
    OracleSqlFeatures.all ++
    OracleSqlRelational.all ++
    OracleSqlDedup.all ++
    OracleSqlCurate.all ++
    OracleSqlText.all ++
    OracleSqlSimilarity.all ++
    OracleSqlMultimodal.all ++
    OracleSqlEvents.all

  /** Sum of the family-map sizes — equal to `all.size` iff the family
    * key sets are pairwise disjoint (pinned in VerifySpec, so a
    * duplicated key cannot silently drop an oracle). */
  val familySizeSum: Int =
    OracleSqlFeatures.all.size + OracleSqlRelational.all.size +
    OracleSqlDedup.all.size + OracleSqlCurate.all.size +
    OracleSqlText.all.size + OracleSqlSimilarity.all.size +
    OracleSqlMultimodal.all.size + OracleSqlEvents.all.size
}
