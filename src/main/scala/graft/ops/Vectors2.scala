package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Vector aggregation with exact cross-engine parity — the missing piece
  * between per-row vector math (graft_dot) and the approximate ANN paths:
  * per-label centroids and distance-to-own-centroid ranking.
  *
  * FP-determinism trick: centroid components are averaged in FIXED POINT.
  * Each float component is scaled by 10⁷ and rounded to a BIGINT once
  * (identical in both engines on identical doubles), summed exactly as
  * integers (order-independent — this is what makes the aggregation
  * deterministic where a double sum would depend on partition order), and
  * divided back out once. Scale: posexplode to (label, dim) is a narrow
  * explode feeding a partial-aggregated sum — the standard elementwise
  * array aggregation at any corpus size.
  */
object Vectors2 {

  def q59Centroids(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = t(s, dir, "embeddings")
    val comps = e.select(col("label"), col("vec_id"),
      posexplode(expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"))
        .as(Seq("dim", "fx")))
    val centroid = comps
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, sfx, n))), e -> CAST(e.sfx AS DOUBLE) / e.n / 10000000)").as("centroid"))
    val vecs = e.select(col("vec_id"), col("label").as("v_label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    vecs
      .join(broadcast(centroid), col("v_label") === col("label"))
      .select(col("label"), col("vec_id"),
        round(expr("graft_dot(emb, centroid)"), 6).as("cos_to_centroid"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("label"))
          .orderBy(col("cos_to_centroid").desc, col("vec_id").asc)))
      .filter(col("rank") <= 3)
      .select(col("label"), col("rank").cast("long").as("rank"), col("vec_id"),
        col("cos_to_centroid"))
      .orderBy(col("label"), col("rank"))
  }

  /** Oracle: identical fixed-point pipeline; DuckDB's list comprehension
    * over generate_series keeps the same ascending-dim fold for the dot.
    */
  val q59Sql: String =
    """WITH comps AS (
         SELECT label, vec_id, i - 1 AS dim,
                CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS fx
         FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)),
       sums AS (SELECT label, dim, SUM(fx) AS sfx, COUNT(*) AS n
                FROM comps GROUP BY 1, 2),
       cent AS (SELECT label, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS centroid
                FROM sums GROUP BY label),
       scored AS (
         SELECT e.label, e.vec_id,
                ROUND(list_reduce([CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]
                                   for i in generate_series(1, len(e.embedding))],
                                  (acc, v) -> acc + v), 6) AS cos_to_centroid
         FROM embeddings e JOIN cent c ON e.label = c.label)
       SELECT label, rank, vec_id, cos_to_centroid FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY label
                        ORDER BY cos_to_centroid DESC, vec_id ASC) AS BIGINT) AS rank
         FROM scored)
       WHERE rank <= 3 ORDER BY label, rank"""

  /** Symmetric int8 quantization of the embedding column — the storage
    * path for vector tables at 100 TB (4 bytes→1 byte per dim; ANN scoring
    * then runs on int8 with a per-vector scale). Per vector: scale =
    * max|x|/127 (order-independent exact max), q_i = round(x_i·127/scale'),
    * reconstruction error reported as MSE over the dequantized values.
    * Every FP step is either order-independent (max), single-rounded
    * (round-half-up, both engines), or the shared ascending graft_dot fold
    * (the squared-error sum) — so the oracle matches bit-for-bit despite
    * 64 FP ops per row. Pure per-row map, no shuffle but the output sort.
    */
  def q85Quantize(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("amax", expr("array_max(transform(emb, x -> abs(x)))"))
      .withColumn("q", expr("transform(emb, x -> CAST(ROUND(x * 127 / amax) AS BIGINT))"))
      .withColumn("err", expr("zip_with(emb, q, (x, v) -> x - CAST(v AS DOUBLE) * amax / 127)"))
      .select(col("vec_id"),
        round(col("amax"), 6).as("amax_r"),
        expr("CAST(aggregate(q, 0L, (a, v) -> a + abs(v)) AS BIGINT)").as("q_l1"),
        round(expr("graft_dot(err, err)") / size(col("emb")), 9).as("mse_r"))
      .orderBy(col("vec_id"))
  }

  /** Oracle: identical max / round / dequant arithmetic; the squared-error
    * sum is the same ascending-index fold as graft_dot; the |q| sum is
    * exact integer.
    */
  val q85Sql: String =
    """WITH v AS (
         SELECT vec_id,
                [CAST(x AS DOUBLE) FOR x IN embedding] AS emb
         FROM embeddings),
       m AS (SELECT vec_id, emb,
                    list_max([abs(x) FOR x IN emb]) AS amax FROM v),
       qz AS (SELECT vec_id, emb, amax,
                     [CAST(ROUND(x * 127 / amax) AS BIGINT) FOR x IN emb] AS q
              FROM m),
       e AS (SELECT vec_id, amax, q,
                    [emb[i] - CAST(q[i] AS DOUBLE) * amax / 127
                     FOR i IN generate_series(1, len(emb))] AS err
             FROM qz)
       SELECT vec_id, ROUND(amax, 6) AS amax_r,
              CAST(list_reduce([abs(x) FOR x IN q], (a, b) -> a + b) AS BIGINT) AS q_l1,
              ROUND(list_reduce([x * x FOR x IN err], (a, b) -> a + b) / len(err), 9) AS mse_r
       FROM e ORDER BY vec_id"""

  /** Per-label cluster cohesion report — the embedding-space health check
    * a curation run publishes next to the dup stats: how tight each label's
    * cluster is (mean member-to-centroid cosine) and how bad its worst
    * outlier is (min). Centroids are the q59 fixed-point construction
    * (order-independent integer sums); each member's cosine is one
    * deterministic ascending graft_dot fold, rounded ONCE to micro-units
    * (BIGINT) so the per-label mean/min aggregate exactly under any
    * partition order — the q99 trick applied to vector space. Scale: one
    * narrow explode for centroids (partial-aggregated), one broadcast of
    * k centroids, one groupBy(label).
    */
  def q105ClusterCohesion(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = t(s, dir, "embeddings")
    val comps = e.select(col("label"), posexplode(
      expr("transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"))
      .as(Seq("dim", "fx")))
    val centroid = comps
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, sfx, n))), e -> CAST(e.sfx AS DOUBLE) / e.n / 10000000)").as("centroid"))
    e.select(col("label").as("v_label"), col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .join(broadcast(centroid), col("v_label") === col("label"))
      .select(col("label"),
        expr("CAST(ROUND(graft_dot(emb, centroid) * 1000000) AS BIGINT)").as("cfx"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("cfx")).cast("double") / count(lit(1)) / 1000000d, 6).as("cohesion_r"),
        round(min(col("cfx")).cast("double") / 1000000d, 6).as("min_cos_r"))
      .orderBy(col("label"))
  }

  val q105Sql: String =
    """WITH comps AS (
         SELECT label, vec_id, i - 1 AS dim,
                CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS fx
         FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)),
       sums AS (SELECT label, dim, SUM(fx) AS sfx, COUNT(*) AS n
                FROM comps GROUP BY 1, 2),
       cent AS (SELECT label, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS centroid
                FROM sums GROUP BY label),
       scored AS (
         SELECT e.label,
                CAST(ROUND(list_reduce([CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]
                                        FOR i IN generate_series(1, len(e.embedding))],
                                       (acc, v) -> acc + v) * 1000000) AS BIGINT) AS cfx
         FROM embeddings e JOIN cent c ON e.label = c.label)
       SELECT label, COUNT(*) AS n_members,
              ROUND(CAST(SUM(cfx) AS DOUBLE) / COUNT(*) / 1000000, 6) AS cohesion_r,
              ROUND(CAST(MIN(cfx) AS DOUBLE) / 1000000, 6) AS min_cos_r
       FROM scored GROUP BY label ORDER BY label"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_centroids" -> (q59Centroids _),
    "q85_quantize" -> (q85Quantize _),
    "q105_cluster_cohesion" -> (q105ClusterCohesion _))

  val oracle: Map[String, String] = Map(
    "q59_centroids" -> q59Sql,
    "q85_quantize" -> q85Sql,
    "q105_cluster_cohesion" -> q105Sql)
}
