package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's operator library; `oracleSql` carries
  * the DuckDB-equivalent SQL for each hash-checkable query (queries without
  * an oracle entry get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multiway join + decimal-exact aggregation — exercises scan, broadcast
    * join, shuffle join, partial+final aggregate, sort.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q05JoinMultiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
      ops.Aggregates.queries ++
      ops.Aggregates2.queries ++
      ops.Windows.queries ++
      ops.Scalars.queries ++
      ops.SetOps.queries ++
      ops.EventOps.queries ++
      ops.Hashtags.queries ++
      ops.Skew.queries ++
      ops.Dedup.queries ++
      ops.Similarity.queries ++
      ops.TextAnalysis.queries ++
      ops.Vectors2.queries ++
      ops.Multimodal.queries ++
      ops.Curation.queries ++
      ops.Pipeline.queries ++
      ops.Linkage.queries ++
      ops.Sketches.queries ++
      ops.Graph.queries ++
      ops.Stats.queries

  /** Ground-truth AUDIT BASELINES: registered queries whose formulation is
    * intentionally corpus-scale (all-pairs / corpus-wide distinct / full
    * sort) because their job is to bound the error of a paired production
    * posture, not to run at 100 TB. Tooling (Bench, compare_bench.py,
    * scale probes) uses this set to separate "production posture" from
    * "ground-truth audit" mechanically instead of by prose (VERDICT r6
    * item 3). Pairings: q51→q52, q54→q101/q102/q143/q146, q55→q56/q84,
    * q128→q128b, q130→q130b, q134→q138. q144 is the MAINTENANCE side of
    * q140 (the index build the probe amortizes over) — marked here for
    * the same mechanical reason: its cost is intentionally corpus-scale
    * and must not be read as a per-probe number (VERDICT r7 item 5).
    * q163 is the same MAINTENANCE marking for the PQ-coded index family
    * (q163 build → q164 probe).
    */
  val auditBaselines: Set[String] = Set(
    "q51_dedup_jaccard",
    "q54_embedding_neardup",
    "q55_ann_bruteforce",
    "q128_kmv_distinct",
    "q130_kmv_overlap",
    "q134_mad_outliers",
    "q144_ann_index_build",
    "q163_ann_pq_index_build")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++
      ops.Aggregates.oracle ++
      ops.Aggregates2.oracle ++
      ops.Windows.oracle ++
      ops.Scalars.oracle ++
      ops.SetOps.oracle ++
      ops.EventOps.oracle ++
      ops.Hashtags.oracle ++
      ops.Skew.oracle ++
      ops.Dedup.oracle ++
      ops.Similarity.oracle ++
      ops.TextAnalysis.oracle ++
      ops.Vectors2.oracle ++
      ops.Multimodal.oracle ++
      ops.Curation.oracle ++
      ops.Pipeline.oracle ++
      ops.Linkage.oracle ++
      ops.Sketches.oracle ++
      ops.Graph.oracle ++
      ops.Stats.oracle
}
