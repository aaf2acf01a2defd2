package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Graph analytics over the mined near-dup graph — the structural
  * companions to connected components ([[Curation.q73DupClusters]]) and
  * PageRank ([[Curation.q120DupGraphRank]]). Reference scope: the
  * reference's analytics stop at flat counts (SparkApplication.scala:88);
  * these are the graph-shaped statistics a curation stack computes on the
  * same duplication edges.
  */
object Graph {

  /** Per-document triangle participation counts over the near-dup graph —
    * the local clustering signal that separates TIGHT boilerplate cliques
    * (every pair near-duplicate: n_tri ≈ C(cluster-1, 2)) from chain- or
    * star-shaped clusters that connected components cannot distinguish
    * (a template with many independent variants shares a component but
    * closes few triangles).
    *
    * Algorithm: degree orientation (Suri & Vassilvitskii, WWW'11 /
    * Schank's thesis) — orient every undirected edge from the endpoint
    * lower in (degree, id) order to the higher one; then each triangle
    * {a,b,c} with a<b<c in that order is found EXACTLY once, as the wedge
    * b←a→c closed by the undirected edge (b,c). Out-degrees under this
    * orientation are bounded by O(sqrt(|E|)) (graph arboricity), so the
    * wedge join's fan-out per vertex — the term that explodes on skewed
    * natural graphs when wedges are generated from raw adjacency — is
    * bounded regardless of how hot the hottest document is.
    *
    * Scale shape: edges come from the MinHash miner (q52's sublinear
    * path) and are pinned once; degree is one partial-aggregated count;
    * the wedge join and the closing semi-join are hash joins keyed on
    * vertex ids — at 100 TB corpus the dup graph is orders of magnitude
    * smaller than the corpus, and nothing here ever touches document
    * text. Driver moves no data.
    */
  def triangleCounts(docs: DataFrame,
                     handle: StorageHandle = StorageHandle.sessionDefault()): DataFrame =
    triangleCountsFromEdges(
      Dedup.minhashNearDups(docs, handle = handle, sorted = false)
        .select(col("id1"), col("id2")),
      handle)

  /** Edge-level entry point: `edges` is any undirected id1<id2 edge frame
    * (one row per unordered pair). Exposed so callers can bring their own
    * graph — and so StatsGraphSpec can drive the orientation's wedge
    * bound on adversarial (hot-hub) fixtures directly, without having to
    * plant text that mines into a star.
    */
  def triangleCountsFromEdges(edges: DataFrame,
                              handle: StorageHandle = StorageHandle.sessionDefault()): DataFrame = {
    val und = handle.pin(edges.select(col("id1"), col("id2")))
    val deg = und.select(col("id1").as("v"))
      .unionByName(und.select(col("id2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // Orient low (degree, id) -> high. Ties in degree break by id, so the
    // order is total and the orientation acyclic.
    val ori = handle.pin(und
      .join(deg.as("d1"), col("id1") === col("d1.v"))
      .join(deg.as("d2"), col("id2") === col("d2.v"))
      .select(
        when(col("d1.d") < col("d2.d") ||
          (col("d1.d") === col("d2.d") && col("id1") < col("id2")),
          struct(col("id1").as("src"), col("id2").as("dst")))
          .otherwise(struct(col("id2").as("src"), col("id1").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst")))
    // Wedges from one source vertex; v < w by id dedupes the unordered
    // pair. The closing edge is checked against the UNDIRECTED id1<id2
    // set, which (v, w) already matches.
    val tri = ori.as("e1")
      .join(ori.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"), col("e2.dst").as("w"))
      .join(und, col("v") === col("id1") && col("w") === col("id2"), "left_semi")
    tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
      .join(deg, col("doc_id") === col("v"))
      .select(col("doc_id"), col("d").as("degree"), col("n_tri"))
      .orderBy(col("doc_id"))
  }

  def q131Triangles(s: SparkSession, dir: String): DataFrame =
    triangleCounts(t(s, dir, "documents"))

  /** Oracle: the exact J ≥ 0.6 edge set (q52-proven equal to the miner's
    * output), the same (degree, id) orientation, the same single-counted
    * wedge closure.
    */
  val q131Sql: String =
    s"""WITH pairs AS (SELECT id1, id2 FROM (${Dedup.q51Pairs})),
       deg AS (SELECT v, COUNT(*) AS d FROM (
                 SELECT id1 AS v FROM pairs UNION ALL SELECT id2 FROM pairs)
               GROUP BY 1),
       ori AS (SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND id1 < id2)
                           THEN id1 ELSE id2 END AS src,
                      CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND id1 < id2)
                           THEN id2 ELSE id1 END AS dst
               FROM pairs JOIN deg d1 ON id1 = d1.v JOIN deg d2 ON id2 = d2.v),
       tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
               FROM ori e1 JOIN ori e2
                 ON e1.src = e2.src AND e1.dst < e2.dst
               WHERE EXISTS (SELECT 1 FROM pairs p
                             WHERE p.id1 = e1.dst AND p.id2 = e2.dst)),
       pv AS (SELECT doc_id, COUNT(*) AS n_tri FROM (
                SELECT u AS doc_id FROM tri
                UNION ALL SELECT v FROM tri
                UNION ALL SELECT w FROM tri)
              GROUP BY 1)
       SELECT pv.doc_id, deg.d AS degree, pv.n_tri
       FROM pv JOIN deg ON pv.doc_id = deg.v
       ORDER BY pv.doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_triangles" -> (q131Triangles _))

  val oracle: Map[String, String] = Map(
    "q131_triangles" -> q131Sql)
}
