package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Training-data curation operators — the pipeline steps that sit BETWEEN
  * the primitive analyses (dedup pair mining, quality scoring, token
  * counting) and a materialized training set. The reference has nothing
  * comparable (its notion of curation is one blacklist filter,
  * SparkApplication.scala:75-78); these complete the north-star surface:
  *
  *   - q73: duplicate-cluster assignment — connected components over the
  *          near-dup pair graph, the step that turns pairwise dedup output
  *          into per-document keep/drop decisions.
  *   - q74: deterministic stratified sampling — hash-ordered top-k per
  *          stratum, the reproducible form of "sample n docs per source".
  *   - q75: token-budget shard packing — assign documents to fixed-size
  *          token shards via a two-phase distributed prefix sum.
  *
  * All three are exact-integer / hash-deterministic → bit-exact DuckDB
  * oracles, no FP parity caveats.
  */
object Curation {

  /** Connected components over the Jaccard ≥ 0.6 near-dup graph (q51's
    * edge set), by iterative min-label propagation: every document starts
    * labeled with its own id; each round, a vertex takes the min of its
    * label and its neighbors' labels; at fixpoint the label is the min
    * doc_id of the connected component — the canonical cluster id. The
    * keeper (cluster representative) is the label-owning document, so
    * `is_keeper` is the per-document dedup verdict.
    *
    * Scale shape: each round is one join (edges ⋈ labels, both hash-
    * partitioned on the join key — co-partitioned after round 1) + one
    * partial-aggregated min. Rounds needed = graph diameter; near-dup
    * components are near-cliques (dup groups), so 2–3 rounds in practice;
    * the large-star/small-star variant (same join shape) bounds rounds at
    * O(log n) for adversarial chains. The driver-side loop only moves a
    * per-round convergence COUNT, never data; at 100 TB, checkpoint every
    * few rounds to truncate lineage (documented, not needed at test sf).
    */
  def q73DupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"))
    val pairs = Dedup.jaccardNearDups(t(s, dir, "documents"))
      .select(col("id1"), col("id2"))
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .cache()
    // Iterate ONLY over vertices that appear in an edge: a document with no
    // near-dup edge can never change label, so the loop's working set is
    // dup-graph-sized (tiny fraction of the corpus at any scale), and the
    // full corpus is touched exactly once by the final left join.
    var labels = edges.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    var changed = 1L
    var round = 0
    while (changed > 0 && round < 25) {
      val prop = edges.join(labels, col("dst") === col("v"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
      val next = labels.join(prop, col("v") === col("src"), "left")
        .select(col("v"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nxt"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
        .cache()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("v"), col("nxt").as("lbl"))
      round += 1
    }
    edges.unpersist()
    docs.join(labels, col("doc_id") === col("v"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_id"),
        (coalesce(col("lbl"), col("doc_id")) === col("doc_id")).as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: transitive closure by recursive CTE over the same edge set
    * (q51's pair SELECT inlined as a derived table); cluster id = min of
    * the document and everything reachable from it.
    */
  val q73Sql: String =
    s"""WITH RECURSIVE pairs AS (SELECT id1, id2 FROM (${Dedup.q51Pairs})),
       edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                 UNION ALL SELECT id2, id1 FROM pairs),
       reach AS (SELECT src AS v, dst AS u FROM edges
                 UNION
                 SELECT r.v, e.dst FROM reach r JOIN edges e ON r.u = e.src)
       SELECT d.doc_id,
              CAST(LEAST(d.doc_id, COALESCE(MIN(r.u), d.doc_id)) AS BIGINT) AS cluster_id,
              d.doc_id = LEAST(d.doc_id, COALESCE(MIN(r.u), d.doc_id)) AS is_keeper
       FROM documents d LEFT JOIN reach r ON d.doc_id = r.v
       GROUP BY d.doc_id ORDER BY d.doc_id"""

  /** Deterministic stratified sample: the first k=25 documents per source,
    * ordered by md5(source:doc_id) — a reproducible uniform draw per
    * stratum (the hash is the random key, the id the tie-break), the
    * curation answer to "give me n docs per source, same answer every run,
    * any cluster size".
    *
    * Scale shape: rank ≤ k over a window is WindowGroupLimit-pruned in
    * Spark 4 — each map task keeps a k-row heap per stratum before the
    * single shuffle on source, so a skewed stratum never materializes its
    * full partition post-shuffle.
    */
  def q74StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val k = 25
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        md5(concat(col("source"), lit(":"), col("doc_id").cast("string"))).as("hk"))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col("source"), col("sample_rank"), col("doc_id"), col("lang"))
      .orderBy(col("source"), col("sample_rank"))
  }

  val q74Sql: String =
    """SELECT source, sample_rank, doc_id, lang FROM (
         SELECT source, doc_id, lang,
                CAST(ROW_NUMBER() OVER (PARTITION BY source
                     ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
                  AS sample_rank
         FROM documents)
       WHERE sample_rank <= 25 ORDER BY source, sample_rank"""

  /** Token-budget shard packing: assign each document (in deterministic
    * doc_id order, per language) to shard floor(tokens_before / 512) — the
    * standard "pack the corpus into ~512-token training shards" layout
    * step.
    *
    * The prefix sum is computed in TWO PHASES so it scales: a naive
    * `SUM() OVER (PARTITION BY lang ORDER BY doc_id)` makes one sequential
    * window partition per language — with a handful of languages that is a
    * handful of threads no matter the cluster size. Instead:
    *   1. block-local sums: group docs into id-blocks of 100, aggregate
    *      per-(lang, block) token sums — partial-aggregated, fully parallel;
    *   2. running offset over the TINY (lang, block) table — the only
    *      sequential window, #blocks rows, broadcast back;
    *   3. block-local running sum (window partition bounded at 100 rows)
    *      plus the block offset = the exact global prefix sum.
    * The oracle states the same result as the naive single window — the
    * two formulations are algebraically identical, which the hash match
    * proves. Block size is a constant here; at 100 TB pick
    * rows-per-task-sized blocks.
    */
  def q75TokenShards(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        expr("doc_id DIV 100").as("blk"))
    val offsets = d.groupBy(col("lang"), col("blk"))
      .agg(sum(col("n_tokens")).as("blk_toks"))
      .select(col("lang").as("o_lang"), col("blk").as("o_blk"),
        coalesce(sum(col("blk_toks")).over(
          Window.partitionBy(col("lang")).orderBy(col("blk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("blk_offset"))
    d.join(broadcast(offsets),
        col("lang") === col("o_lang") && col("blk") === col("o_blk"))
      .withColumn("cum_before",
        col("blk_offset") + coalesce(sum(col("n_tokens")).over(
          Window.partitionBy(col("lang"), col("blk")).orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        expr("CAST(cum_before DIV 512 AS BIGINT)").as("shard_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Oracle: the naive single-window prefix sum — same semantics the
    * two-phase Spark plan computes.
    */
  val q75Sql: String =
    """WITH d AS (SELECT doc_id, lang,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         FROM documents),
       c AS (SELECT doc_id, lang, n_tokens,
                COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
             FROM d)
       SELECT lang, doc_id, n_tokens, CAST(cum_before // 512 AS BIGINT) AS shard_id
       FROM c ORDER BY lang, doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_dup_clusters" -> (q73DupClusters _),
    "q74_stratified_sample" -> (q74StratifiedSample _),
    "q75_token_shards" -> (q75TokenShards _))

  val oracle: Map[String, String] = Map(
    "q73_dup_clusters" -> q73Sql,
    "q74_stratified_sample" -> q74Sql,
    "q75_token_shards" -> q75Sql)
}
