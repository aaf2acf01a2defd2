package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Similarity search over the embedding column (`embeddings.embedding`,
  * Array[Float], unit-normalized so dot product = cosine).
  *
  * q55 is the exact baseline: brute-force top-k per query via a broadcast
  * cross join + per-query heap (TakeOrderedAndProject shape through a
  * row_number window). q56 is the scale path: random-hyperplane LSH
  * restricts each probe to its bucket, turning O(|Q|·|N|) into
  * O(|Q|·|N|/2^bits) expected — the standard recall/cost dial. Both share
  * the same fold-ordered DOUBLE dot product so results are reproducible
  * bit-for-bit.
  */
object Similarity {
  /** Left-to-right fold dot product in DOUBLE (graft_dot, the codegen'd
    * expression in graft.functions) — identical evaluation order to the
    * DuckDB oracle's list_reduce, hence bit-identical results.
    */
  private val dot =
    "graft_dot(transform(q.embedding, x -> CAST(x AS DOUBLE)), transform(n.embedding, x -> CAST(x AS DOUBLE)))"

  /** Exact k-NN: 20 query vectors (vec_id < 20) against the full corpus.
    * The query side is tiny → broadcast; the corpus streams partition-local
    * with zero shuffle of the big side; the only shuffle is the per-query
    * top-k window over |Q|·|N| scored rows, which AQE coalesces. Output
    * keeps ids + rank (integers) and the cosine rounded to 6 — ranking is
    * done on the full-precision value.
    */
  def q55AnnBruteforce(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val queries = e.filter(col("vec_id") < 20)
    val scored = broadcast(queries.as("q")).join(e.as("n"), col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"),
        expr(dot).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  val q55Sql: String =
    """WITH scored AS (
         SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                list_reduce([CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)
                             for i in generate_series(1, len(q.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
         WHERE q.vec_id < 20)
       SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cos_r FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         FROM scored)
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Multi-table hyperplane-LSH ANN (the 100 TB path): L = 16 independent
    * tables of r = 4 sign bits; a probe compares only against vectors
    * sharing a bucket in ≥ 1 table. Collision probability per table for
    * angle θ is (1 − θ/π)^r, so at cos ≈ 0.5 (θ = 60°, per-bit agreement
    * 2/3) recall across 16 tables is 1 − (1 − (2/3)⁴)¹⁶ ≈ 0.97, while a
    * random pair (per-bit 1/2) collides somewhere with prob
    * 1 − (1 − 1/16)¹⁶ ≈ 0.64. This near-uniform corpus is hyperplane
    * LSH's worst case — real embedding corpora cluster, pushing the true-
    * neighbor per-bit agreement toward 1 and the candidate fraction down;
    * (L, r) is the recall/cost dial. Recall vs q55 is pinned by the
    * scalatest spec; ADDITIONALLY the result is hash-checked against a
    * DuckDB oracle (q56Sql): approximate-vs-exact-kNN, but deterministic —
    * both engines compute identical bucket ids from identical plane
    * literals (see [[graft.functions.Hyperplanes]]), so the candidate set,
    * scores, and id-tie-broken ranks agree bit-for-bit.
    */
  def q56AnnLsh(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    // Signatures via the shared deterministic plane set
    // (graft.functions.Hyperplanes): 64 codegen'd graft_dot loops per row
    // against literal planes — round 1's 64 interpreted
    // aggregate(zip_with(...)) folds were q56's whole cost (VERDICT r1).
    // Same seed/packing, so buckets — and results — are unchanged.
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val tabbed = emb
      .select(col("vec_id"), posexplode(
        expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb"))).as(Seq("tbl", "bucket")))
    val probes = tabbed.filter(col("vec_id") < 20)
    // Candidate id pairs first (a pair may collide in several tables —
    // distinct on the ids, NOT on rows carrying the vectors), then join
    // the vectors back for one scoring pass.
    val cands = broadcast(probes.as("q"))
      .join(tabbed.as("n"),
        col("q.tbl") === col("n.tbl") && col("q.bucket") === col("n.bucket") &&
          col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"))
      .distinct()
    cands
      .join(broadcast(emb.filter(col("vec_id") < 20).withColumnRenamed("emb", "q_emb")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .join(emb.withColumnRenamed("emb", "n_emb"), col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("graft_dot(q_emb, n_emb)").as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB replica of q56: identical signature list per vector (plane
    * literals shared via [[graft.functions.Hyperplanes.duckBucketsSql]]),
    * candidates = probe pairs colliding in ≥ 1 of the 16 tables, identical
    * ascending-index double fold for the score, identical rank tie-break.
    */
  def q56Sql: String = {
    val sig = graft.functions.Hyperplanes.duckBucketsSql("embedding")
    val nt = graft.functions.Hyperplanes.tables
    s"""WITH sig AS (SELECT vec_id, $sig AS sig FROM embeddings),
       cands AS (
         SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
         FROM sig q JOIN sig n ON q.vec_id <> n.vec_id
         WHERE q.vec_id < 20
           AND list_contains([q.sig[i] = n.sig[i] FOR i IN generate_series(1, $nt)], true)),
       scored AS (
         SELECT c.query_id, c.neighbor_id,
                list_reduce([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(a.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM cands c JOIN embeddings a ON c.query_id = a.vec_id
                      JOIN embeddings b ON c.neighbor_id = b.vec_id)
       SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cos_r FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         FROM scored)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** Multi-probe hyperplane LSH (closes SURVEY §8's "multi-probe if the
    * recall floor must rise"): each probe searches its own bucket PLUS the
    * four one-bit-flipped buckets in every table — the perturbation
    * sequence for sign-LSH, where a near-threshold neighbor most likely
    * differs in exactly one plane's sign. Recall rises (strict superset of
    * q56's candidates) without adding tables, i.e. without re-hashing the
    * corpus — the standard memory/recall trade (Lv et al., "Multi-Probe
    * LSH", VLDB'07). Candidate volume grows ~5× per probe but ONLY on the
    * probe side: the corpus index is unchanged, so at 100 TB the extra
    * cost is 4 more bucket lookups per (probe, table), not a bigger index.
    * Deterministic (same shared planes + fixed flip set) → bit-exact
    * DuckDB oracle like q56.
    */
  def q84AnnMultiprobe(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val tabbed = emb
      .select(col("vec_id"), posexplode(
        expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb"))).as(Seq("tbl", "bucket")))
    // Probe side: home bucket + the 4 single-bit perturbations.
    val probes = tabbed.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("tbl"), explode(
        expr("array(bucket, bucket ^ 8, bucket ^ 4, bucket ^ 2, bucket ^ 1)")).as("bucket"))
    val cands = broadcast(probes.as("q"))
      .join(tabbed.as("n"),
        col("q.tbl") === col("n.tbl") && col("q.bucket") === col("n.bucket") &&
          col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"))
      .distinct()
    cands
      .join(broadcast(emb.filter(col("vec_id") < 20).withColumnRenamed("emb", "q_emb")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .join(emb.withColumnRenamed("emb", "n_emb"), col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("graft_dot(q_emb, n_emb)").as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB replica of q84: same signatures, candidate = collision of the
    * neighbor's bucket with the probe's home-or-one-bit-flipped bucket in
    * any table.
    */
  def q84Sql: String = {
    val sig = graft.functions.Hyperplanes.duckBucketsSql("embedding")
    val nt = graft.functions.Hyperplanes.tables
    s"""WITH sig AS (SELECT vec_id, $sig AS sig FROM embeddings),
       cands AS (
         SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
         FROM sig q JOIN sig n ON q.vec_id <> n.vec_id
         WHERE q.vec_id < 20
           AND list_contains([n.sig[i] = q.sig[i] OR n.sig[i] = xor(q.sig[i], 8)
                              OR n.sig[i] = xor(q.sig[i], 4) OR n.sig[i] = xor(q.sig[i], 2)
                              OR n.sig[i] = xor(q.sig[i], 1)
                              FOR i IN generate_series(1, $nt)], true)),
       scored AS (
         SELECT c.query_id, c.neighbor_id,
                list_reduce([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(a.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM cands c JOIN embeddings a ON c.query_id = a.vec_id
                      JOIN embeddings b ON c.neighbor_id = b.vec_id)
       SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cos_r FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         FROM scored)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** IVF (inverted-file) ANN — the other standard scale path the prompt
    * names: a coarse quantizer partitions the corpus into k=16 cells; each
    * probe scores only the vectors in its `nProbe`=4 nearest cells
    * (expected candidate fraction nProbe/k of the corpus).
    *
    * The quantizer is DETERMINISTIC so the result is fully oracle-checkable
    * (round 2 used seeded KMeans — rows-only, and its 10 MLlib iterations
    * were ~6 s of the bench): seed cells are the 4 sign bits of hyperplane
    * table 0 ([[graft.functions.Hyperplanes]]), cell centroids are
    * fixed-point integer means (the q59 trick — order-independent, so
    * identical under any partitioning and in DuckDB), and every vector is
    * then assigned to its nearest centroid — i.e. one exact Lloyd step from
    * a deterministic initialization. Same IVF semantics (data-derived
    * centroids, nearest-centroid cells, nProbe search), zero training loop.
    *
    * Scale shape: centroid build is one explode + partial-aggregated sum
    * (map-side combined); assignment is a broadcast of k centroids against
    * a streaming corpus scan (k·dim doubles — tiny); probes broadcast; the
    * candidate join shuffles only the nProbe cells' ids. At 100 TB, build
    * centroids from a sample and more Lloyd steps if cells drift — the
    * assignment/search jobs are unchanged.
    */
  /** Shared IVF coarse quantizer (q58's scaladoc has the full design
    * rationale): deterministic 4-bit seed cells → fixed-point centroids →
    * one Lloyd-step centroid ranking. Returns (emb, ranked) where ranked
    * carries (vec_id, cell, rn): rn = 1 is the cell assignment, rn <=
    * nProbe the probe list. Reused by q58 (ANN search) and q107
    * (semantic dedup).
    */
  private[ops] def ivfScored(s: SparkSession, dir: String,
                             cellBits: Int = 4): (DataFrame, DataFrame) = {
    val (emb, _, scored) = ivfModel(s, dir, cellBits)
    (emb, scored)
  }

  /** [[ivfScored]] with the coarse codebook exposed: (emb, cents, scored)
    * where cents = (cell, centroid array<double>). Residual consumers
    * (q156) need the centroid vectors themselves, not just the dots.
    */
  private[graft] def ivfModel(s: SparkSession, dir: String,
                              cellBits: Int = 4): (DataFrame, DataFrame, DataFrame) = {
    graft.functions.VectorExpressions.register(s)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    // Seed partition: one cellBits-bit sign-cell per vector (cellBits
    // codegen'd dots); cellBits = 4 reproduces q58's original 16 cells.
    val seeded = emb.withColumn("cell0",
      expr(graft.functions.Hyperplanes.sparkCellExprN("emb", cellBits)))
    // Fixed-point per-cell centroid (exact integer sums — deterministic).
    // Pinned (≤ 2^cellBits tiny rows, r13): every consumer references
    // the codebook at least twice (the scoring crossJoin + q156's
    // residual subtraction, or the assignment and probe branches), and
    // each un-pinned reference re-ran the corpus-scale training
    // aggregation — measured as 1-2 extra full passes per IVF query
    // (guide §2.4: remove recomputed subtrees outright).
    val cents = StorageHandle.sessionDefault().pin(seeded
      .select(col("cell0"), posexplode(
        expr("transform(emb, x -> CAST(ROUND(x * 10000000) AS BIGINT))")).as(Seq("dim", "fx")))
      .groupBy(col("cell0"), col("dim"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .groupBy(col("cell0"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, sfx, n))), e -> CAST(e.sfx AS DOUBLE) / e.n / 10000000)").as("centroid"))
      .select(col("cell0").as("cell"), col("centroid")))
    // One Lloyd step: rank all k centroids per vector (k·N codegen'd dots
    // against the broadcast centroids). The ranking window shuffles ONLY
    // the narrow (vec_id, cell, d) triples — never the 16×-multiplied
    // embedding vectors, which join back by vec_id afterwards (one narrow
    // hash join each for the corpus assignment and the 20 probes).
    // rn=1 is the cell assignment; rn<=nProbe on the probe subset is the
    // cell list to search.
    val scored = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        expr("graft_dot(emb, centroid)").as("d"))
    (emb, cents, scored)
  }

  /** [[ivfScored]] plus the per-vector centroid ranking window (rn = 1 is
    * the assignment, rn <= nProbe the probe list). q58 needs the full
    * ranking; assignment-only consumers (q107/q111) should aggregate
    * [[ivfScored]] directly instead of sorting n·2^cellBits rows.
    */
  private[graft] def ivfRanked(s: SparkSession, dir: String,
                               cellBits: Int = 4): (DataFrame, DataFrame) = {
    val (emb, scored) = ivfScored(s, dir, cellBits)
    (emb, scored.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
        .orderBy(col("d").desc, col("cell").asc))))
  }

  /** One-row broadcast form of an IVF codebook: `cands` =
    * array<struct<cell int, cent array<double>>>, cell ascending — a
    * ≤ 2^cellBits-row aggregation, independent of corpus size.
    */
  private def ivfCentsRow(cents: DataFrame): DataFrame =
    cents.agg(expr("transform(array_sort(collect_list(struct(cell, centroid))), e -> named_struct('cell', e.cell, 'cent', e.centroid))").as("cands"))

  def q58AnnIvf(s: SparkSession, dir: String): DataFrame = {
    val nProbe = 4
    // r13: assignment and probe routing are per-row expressions against
    // the one-row broadcast codebook — graft_argmax_dot IS ivfRanked's
    // rn = 1 and graft_top_dots IS its rn <= nProbe slice (ordering-
    // parity arguments in graft.functions.ArgmaxExpressions; the oracle
    // re-proves both here). The n·2^cellBits scored explosion, its
    // ranking window (exchange + full sort), and the two joins that
    // re-attached emb are gone from the plan (guide §2.4).
    val (emb, cents, _) = ivfModel(s, dir)
    val centsRow = ivfCentsRow(cents)
    val assigned = emb.crossJoin(broadcast(centsRow))
      .select(col("vec_id"), col("emb"),
        expr("graft_argmax_dot(emb, cands)").as("cell"))
    val probeCells = emb.filter(col("vec_id") < 20)
      .crossJoin(broadcast(centsRow))
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"),
        explode(expr(s"graft_top_dots(emb, cands, $nProbe)")).as("p"))
      .select(col("query_id"), col("q_emb"), col("p.cell").as("cell"))
    broadcast(probeCells)
      .join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr("graft_dot(q_emb, emb)").as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB replica of q58: identical seed cells (shared plane literals),
    * identical fixed-point centroids, identical centroid-dot ranking with
    * the same tie-break, identical nProbe search and final top-5. A pair
    * (query, neighbor) appears once — `assigned` has one cell per vector
    * and a probe's nProbe cells are distinct — so no DISTINCT is needed.
    */
  /** DuckDB replica of [[ivfRanked]] as a CTE prefix (identical seed
    * cells via shared plane literals, identical fixed-point centroids,
    * identical centroid-dot ranking and tie-break), ending at the
    * `assigned` cell-assignment CTE. Shared by q58Sql and q107Sql.
    */
  private def ivfCteSql: String = ivfCteSql(4)

  private def ivfCteSql(cellBits: Int): String = {
    val cell0 = graft.functions.Hyperplanes.duckCellSqlN("embedding", cellBits)
    s"""seeded AS (SELECT vec_id, embedding, $cell0 AS cell0 FROM embeddings),
       comps AS (SELECT cell0, i - 1 AS dim,
                        CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS fx
                 FROM seeded, UNNEST(generate_series(1, len(embedding))) AS t(i)),
       sums AS (SELECT cell0, dim, SUM(fx) AS sfx, COUNT(*) AS n FROM comps GROUP BY 1, 2),
       cent AS (SELECT cell0 AS cell, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS centroid
                FROM sums GROUP BY cell0),
       ranked AS (
         SELECT e.vec_id, c.cell,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                  list_reduce([CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]
                               FOR i IN generate_series(1, len(e.embedding))],
                              (acc, v) -> acc + v) DESC, c.cell ASC) AS rn
         FROM embeddings e CROSS JOIN cent c),
       assigned AS (SELECT vec_id, cell FROM ranked WHERE rn = 1)"""
  }

  def q58Sql: String = {
    s"""WITH $ivfCteSql,
       probecells AS (SELECT vec_id AS query_id, cell FROM ranked WHERE rn <= 4 AND vec_id < 20),
       scored AS (
         SELECT p.query_id, a.vec_id AS neighbor_id,
                list_reduce([CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(qe.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM probecells p JOIN assigned a USING (cell)
              JOIN embeddings qe ON p.query_id = qe.vec_id
              JOIN embeddings ne ON a.vec_id = ne.vec_id
         WHERE a.vec_id <> p.query_id)
       SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cos_r FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         FROM scored)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** Quantized ANN serving shape (VERDICT r3 item 4): LSH candidates →
    * cheap INT8 scoring → exact rerank of the short list. This is the
    * standard memory-bound layout: the int8 codes (q85's symmetric
    * per-vector quantization, 1 byte/dim + one scale) are what a 100 TB
    * vector corpus actually keeps hot; the float vectors are only touched
    * for the top-2k rerank.
    *
    * Stage shape: candidates are q56's multi-table hyperplane-LSH pairs
    * (probe side broadcasts, corpus index unchanged); the int8 score is an
    * EXACT integer dot product (|q_i| ≤ 127, 64 dims → |score| ≤ 2²⁰ —
    * no overflow, no FP, so cross-engine bit-equality is free); per query
    * the top-2k = 10 by int score (ties to neighbor id) rerank with the
    * shared double fold. Everything is deterministic, so the oracle
    * hash-checks the full approximate pipeline end to end.
    */
  def q87AnnQuantRescore(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val W = org.apache.spark.sql.expressions.Window
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    // Per-vector symmetric int8 codes — q85's exact arithmetic.
    val codes = emb
      .withColumn("amax", expr("array_max(transform(emb, x -> abs(x)))"))
      .select(col("vec_id"),
        expr("transform(emb, x -> CAST(ROUND(x * 127 / amax) AS BIGINT))").as("code"))
    val tabbed = emb
      .select(col("vec_id"), posexplode(
        expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb"))).as(Seq("tbl", "bucket")))
    val probes = tabbed.filter(col("vec_id") < 20)
    val cands = broadcast(probes.as("q"))
      .join(tabbed.as("n"),
        col("q.tbl") === col("n.tbl") && col("q.bucket") === col("n.bucket") &&
          col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"))
      .distinct()
    // Integer scoring pass over the candidates (codes broadcast-joined by
    // id — narrow), then keep 2k = 10 per query.
    val shortlist = cands
      .join(broadcast(codes.filter(col("vec_id") < 20).withColumnRenamed("code", "q_code")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .join(codes.withColumnRenamed("code", "n_code"), col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("aggregate(zip_with(q_code, n_code, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("int_score"))
      .withColumn("rn", row_number().over(
        W.partitionBy(col("query_id")).orderBy(col("int_score").desc, col("neighbor_id").asc)))
      .filter(col("rn") <= 10)
    // Exact rerank of the shortlist only.
    shortlist
      .join(broadcast(emb.filter(col("vec_id") < 20).withColumnRenamed("emb", "q_emb")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .join(emb.withColumnRenamed("emb", "n_emb"), col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"), col("int_score"),
        expr("graft_dot(q_emb, n_emb)").as("cosine"))
      .withColumn("rank", row_number().over(
        W.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        col("int_score"), round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB replica of q87: identical plane-literal candidates (q56's),
    * identical ROUND-half-up int8 codes (q85's), exact integer shortlist,
    * identical ascending-index double fold for the rerank.
    */
  def q87Sql: String = {
    val sig = graft.functions.Hyperplanes.duckBucketsSql("embedding")
    val nt = graft.functions.Hyperplanes.tables
    s"""WITH sig AS (SELECT vec_id, $sig AS sig FROM embeddings),
       cands AS (
         SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
         FROM sig q JOIN sig n ON q.vec_id <> n.vec_id
         WHERE q.vec_id < 20
           AND list_contains([q.sig[i] = n.sig[i] FOR i IN generate_series(1, $nt)], true)),
       v AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS emb FROM embeddings),
       codes AS (
         SELECT vec_id,
                [CAST(ROUND(x * 127 / list_max([abs(y) FOR y IN emb])) AS BIGINT)
                 FOR x IN emb] AS code
         FROM v),
       shortlist AS (
         SELECT query_id, neighbor_id, int_score FROM (
           SELECT c.query_id, c.neighbor_id,
                  CAST(list_reduce([qc.code[i] * nc.code[i]
                                    FOR i IN generate_series(1, len(qc.code))],
                                   (a, b) -> a + b) AS BIGINT) AS int_score,
                  ROW_NUMBER() OVER (PARTITION BY c.query_id
                    ORDER BY CAST(list_reduce([qc.code[i] * nc.code[i]
                                    FOR i IN generate_series(1, len(qc.code))],
                                   (a, b) -> a + b) AS BIGINT) DESC,
                             c.neighbor_id ASC) AS rn
           FROM cands c JOIN codes qc ON c.query_id = qc.vec_id
                        JOIN codes nc ON c.neighbor_id = nc.vec_id)
         WHERE rn <= 10),
       reranked AS (
         SELECT s.query_id, s.neighbor_id, s.int_score,
                list_reduce([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(a.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM shortlist s JOIN embeddings a ON s.query_id = a.vec_id
                          JOIN embeddings b ON s.neighbor_id = b.vec_id)
       SELECT query_id, rank, neighbor_id, int_score, ROUND(cosine, 6) AS cos_r FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         FROM reranked)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** Semantic dedup (the SemDeDup shape — cluster, then mine pairs only
    * within a cluster): embedding near-duplicate pairs generated WITHIN
    * the IVF coarse-quantizer cells, the cluster-scoped alternative to
    * q54/q101's hyperplane-bucket candidate generation. Candidate volume
    * is Σ_cells |cell|² instead of n²; at 100 TB the cell count scales
    * with the corpus (k ∝ n / target-cell-size, centroids from a sample
    * plus more Lloyd steps) so per-cell quadratic cost stays bounded —
    * and unlike the LSH path, candidates are ranked against data-derived
    * structure, which is why SemDeDup finds the semantic (not just
    * lexical) duplicates. Verification is the exact fixed-order cosine
    * fold shared bit-for-bit with the oracle; threshold 0.45 matches the
    * q54 family so the outputs are comparable.
    *
    * Scale shape: one narrow shuffle on cell for the self-join (AQE
    * splits a hot cell the same way it splits a hot LSH band —
    * ScaleTechniquesSpec's skew case); the exact cosine runs only on
    * same-cell pairs.
    */
  def q107SemanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticDedup(s, dir, cellBits = 4)

  /** The dialed form: 2^cellBits cells. Fixing any cell count is a fixed
    * geometry — at B× the corpus, raise cellBits by log2(B) to hold cell
    * size (and per-cell quadratic cost) constant; q111 registers the 8-bit
    * posture oracle-checked, mirroring q101's role for q54.
    */
  def semanticDedup(s: SparkSession, dir: String, cellBits: Int): DataFrame = {
    val (emb, cents, _) = ivfModel(s, dir, cellBits)
    // Assignment is an ARGMAX, not a ranking — and since r13 a per-row
    // graft_argmax_dot against the one-row broadcast codebook: the
    // previous max(struct(d, -cell)) already avoided the n·2^cellBits
    // ranking window (the dominant sf1 cost when this was a sort), but
    // a struct-ordered max is not hash-aggregable, so it still paid a
    // corpus-scale SortAggregate pair per reference (the pair-mining
    // self-join makes TWO) plus the scored explosion and the join that
    // re-attached emb. The expression keeps the identical d DESC / cell
    // ASC tie-break, so the oracle's ROW_NUMBER formulation still
    // matches bit-for-bit. (Pinning the narrow frame instead was tried
    // and reverted — cache barrier, probes/r13opt.)
    val assigned = emb.crossJoin(broadcast(ivfCentsRow(cents)))
      .select(col("vec_id"), col("emb"),
        expr("graft_argmax_dot(emb, cands)").as("cell"))
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("a.cell").as("cell"),
        expr("graft_dot(a.emb, b.emb)").as("cosine"))
      .filter(col("cosine") >= 0.45)
      .select(col("id1"), col("id2"), col("cell"), round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("id1"), col("id2"))
  }

  /** q107 at the corpus-growth geometry: 256 cells from 8 sign bits. At
    * this SF the cells are oversplit (the point is the VERIFIED dial, not
    * the sf0.01 recall — q101's role for q54); the sf1 probe table in
    * BASELINE.md carries the cost evidence.
    */
  def q111SemanticDedupScaled(s: SparkSession, dir: String): DataFrame =
    semanticDedup(s, dir, cellBits = 8)

  /** 1024-cell SemDeDup — registered as the MEASURED FALSIFICATION of the
    * naive cell-step doctrine for flat IVF. The expectation (q107→q111
    * extrapolated, "cellBits tracks log₂(n)") was that 4× more cells
    * would relieve q111's 10.6× sf10 ratio the way q146 relieved q143.
    * The same-boot sf10 probe says otherwise: q147 26.2 s vs q111 13.8 s
    * — SLOWER at 4× fewer candidates — because a flat IVF pays Θ(n·k)
    * assignment dots in [[ivfScored]]'s Lloyd step (600k × 1024 ≈ 6×10⁸
    * 64-dim dots at sf10), so stepping k per decade makes TOTAL
    * assignment cost quadratic in corpus size even as candidates shrink.
    * The dials that DO step per decade are the hash-cell geometries
    * (q143/q146: assignment is b sign dots per row, k-independent); the
    * IVF-side scale path is HIERARCHICAL assignment (two-level √k × √k,
    * Θ(n·√k)) — a design note, deliberately not registered until a probe
    * can grade it. Oracle-checked like every geometry; kept registered
    * because a measured negative result is what stops the next reader
    * from re-deriving the wrong extrapolation.
    */
  def q147SemanticDedup1k(s: SparkSession, dir: String): DataFrame =
    semanticDedup(s, dir, cellBits = 10)

  /** Oracle: the shared IVF CTE prefix, same-cell pairs, same fixed-order
    * cosine fold and threshold. */
  def q107Sql: String = semanticSql(4)

  def q111Sql: String = semanticSql(8)

  def q147Sql: String = semanticSql(10)

  /** q150 — HIERARCHICAL IVF assignment (the fix q147's falsification
    * record names): two-level Lloyd assignment, Θ(n·(2^hi + 2^lo)) instead
    * of flat IVF's Θ(n·2^(hi+lo)).
    *
    * q147 measured the flat-IVF scale problem: stepping the cell count
    * with the corpus makes the Lloyd assignment itself quadratic in
    * corpus size (600k × 1024 centroid dots at sf10 — SLOWER than the
    * 256-cell q111 despite 4× fewer candidates). The standard coarse/fine
    * decomposition fixes the asymptotics: assign each vector to one of
    * 2^hi SUPER cells (2^hi dots), then to one of ≤ 2^lo SUB cells
    * *within its super cell* (≤ 2^lo dots — the sub-centroid join is ON
    * super, never a cross join). With hi = lo = 5 this gives 1024
    * effective cells for 64 assignment dots per vector — a 16× assignment
    * cut vs q147 at identical candidate-volume geometry.
    *
    * Both levels reuse the flat quantizer's deterministic machinery:
    * sign-bit seeding (disjoint plane spans of the shared seed-7 pool),
    * exact fixed-point centroids, argmax assignment with the d DESC /
    * cell ASC tie-break — so the DuckDB oracle replays every step
    * bit-for-bit. Runs over the planted-survivor fixture (see
    * [[Dedup.plantedEmbeddings]]): an exact duplicate follows its
    * original through BOTH assignment levels (identical seed cells,
    * identical centroid dots), so the pair output is provably non-empty
    * at every SF.
    *
    * Scale shape: super scoring is a broadcast of 2^hi centroids; sub
    * scoring broadcasts ≤ 2^(hi+lo) (super, sub) centroids but each
    * vector joins only its own super's group; pair mining shuffles once
    * on the (super, sub) cell like q107. At 100 TB both levels step
    * (hi, lo) with log₂(corpus)/2 each, keeping assignment Θ(n·√k).
    */
  def q150SemanticDedupHier(s: SparkSession, dir: String): DataFrame =
    semanticDedupHier(s, dir, hiBits = 5, loBits = 5)

  def semanticDedupHier(s: SparkSession, dir: String,
                        hiBits: Int, loBits: Int): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val H = graft.functions.Hyperplanes
    val emb = Dedup.plantedEmbeddings(s, dir)
    val fxArr = "transform(emb, x -> CAST(ROUND(x * 10000000) AS BIGINT))"
    val centroidAgg =
      expr("transform(array_sort(collect_list(struct(dim, sfx, n))), e -> CAST(e.sfx AS DOUBLE) / e.n / 10000000)")
    // Level 1: super cells from planes [0, hi).
    val supSeeded = emb.withColumn("super0",
      expr(H.sparkCellExprRange("emb", 0, hiBits)))
    val supCents = supSeeded
      .select(col("super0"), posexplode(expr(fxArr)).as(Seq("dim", "fx")))
      .groupBy(col("super0"), col("dim"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .groupBy(col("super0"))
      .agg(centroidAgg.as("centroid"))
      .select(col("super0").as("cell"), col("centroid"))
    // r13: both assignment levels are per-row graft_argmax_dot evals
    // against one-row broadcast codebooks (ordering-parity argument in
    // graft.functions.ArgmaxExpressions) — the old shape exploded
    // n·2^hi (then per-super) scored rows and folded them back through
    // corpus-scale SortAggregate pairs (struct-ordered max is not
    // hash-aggregable), recomputed per pair-mining self-join side, plus
    // the join that re-attached emb for level 2. supAssigned carries
    // emb through, so level 2 starts without a join. (Pinning the
    // narrow frames instead was tried and reverted — cache barriers,
    // probes/r13opt.)
    val supAssigned = emb.crossJoin(broadcast(ivfCentsRow(supCents)))
      .select(col("vec_id"), col("emb"),
        expr("graft_argmax_dot(emb, cands)").as("super"))
    // Level 2: sub cells from the DISJOINT plane span [hi, hi + lo),
    // seeded and assigned within each super cell.
    val subSeeded = supAssigned
      .withColumn("sub0", expr(H.sparkCellExprRange("emb", hiBits, loBits)))
    val subCents = subSeeded
      .select(col("super"), col("sub0"), posexplode(expr(fxArr)).as(Seq("dim", "fx")))
      .groupBy(col("super"), col("sub0"), col("dim"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .groupBy(col("super"), col("sub0"))
      .agg(centroidAgg.as("centroid"))
      .select(col("super"), col("sub0").as("sub"), col("centroid"))
    // Per-super candidate map (≤ 2^(hi+lo) rows): each vector folds only
    // its own super's sub-cells — the same ≤ 2^lo dots the join form
    // scored, via the map side of graft_pq_hier_code's stage-2 idiom
    // (one-group beam = plain argmax within the group).
    val subMapRow = subCents.groupBy(col("super"))
      .agg(expr("transform(array_sort(collect_list(struct(sub, centroid))), e -> named_struct('cell', e.sub, 'cent', e.centroid))").as("cands"))
      .agg(expr("map_from_entries(collect_list(struct(super, cands)))").as("submap"))
    val assigned = subSeeded.crossJoin(broadcast(subMapRow))
      .select(col("vec_id"), col("emb"),
        (col("super") * lit(1 << loBits) +
          expr("graft_argmax_dot(emb, element_at(submap, super))"))
          .cast("int").as("cell"))
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("a.cell").as("cell"),
        expr("graft_dot(a.emb, b.emb)").as("cosine"))
      .filter(col("cosine") >= 0.45)
      .select(col("id1"), col("id2"), col("cell"), round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("id1"), col("id2"))
  }

  /** DuckDB replica of [[semanticDedupHier]]: identical seed spans,
    * fixed-point centroids, and per-level argmax (ROW_NUMBER with the
    * same tie-break), over the same planted-survivor union.
    */
  def q150Sql: String = hierSql(5, 5)

  private def hierSql(hiBits: Int, loBits: Int): String = {
    val H = graft.functions.Hyperplanes
    val hiCell = H.duckCellSqlRange("embedding", 0, hiBits)
    val loCell = H.duckCellSqlRange("embedding", hiBits, loBits)
    def dotC(e: String, c: String) =
      s"""list_reduce([CAST($e.embedding[i] AS DOUBLE) * $c.centroid[i]
          FOR i IN generate_series(1, len($e.embedding))], (acc, v) -> acc + v)"""
    s"""WITH emb AS (SELECT vec_id, embedding FROM ${Dedup.plantedEmbeddingsSql}),
       sseeded AS (SELECT vec_id, embedding, $hiCell AS super0 FROM emb),
       scomps AS (SELECT super0, i - 1 AS dim,
                         CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS fx
                  FROM sseeded, UNNEST(generate_series(1, len(embedding))) AS t(i)),
       ssums AS (SELECT super0, dim, SUM(fx) AS sfx, COUNT(*) AS n FROM scomps GROUP BY 1, 2),
       scent AS (SELECT super0 AS cell, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS centroid
                 FROM ssums GROUP BY super0),
       sranked AS (SELECT e.vec_id, c.cell,
                          ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ${dotC("e", "c")} DESC, c.cell ASC) AS rn
                   FROM emb e CROSS JOIN scent c),
       sassign AS (SELECT vec_id, cell AS super FROM sranked WHERE rn = 1),
       bseeded AS (SELECT e.vec_id, e.embedding, a.super, $loCell AS sub0
                   FROM emb e JOIN sassign a USING (vec_id)),
       bcomps AS (SELECT super, sub0, i - 1 AS dim,
                         CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS fx
                  FROM bseeded, UNNEST(generate_series(1, len(embedding))) AS t(i)),
       bsums AS (SELECT super, sub0, dim, SUM(fx) AS sfx, COUNT(*) AS n FROM bcomps GROUP BY 1, 2, 3),
       bcent AS (SELECT super, sub0 AS sub, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS centroid
                 FROM bsums GROUP BY super, sub0),
       branked AS (SELECT e.vec_id, e.super, c.sub,
                          ROW_NUMBER() OVER (PARTITION BY e.vec_id
                            ORDER BY ${dotC("e", "c")} DESC, c.sub ASC) AS rn
                   FROM bseeded e JOIN bcent c USING (super)),
       assigned AS (SELECT vec_id, super * ${1 << loBits} + sub AS cell
                    FROM branked WHERE rn = 1),
       pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2, a.cell
                 FROM assigned a JOIN assigned b
                   ON a.cell = b.cell AND a.vec_id < b.vec_id),
       scored AS (
         SELECT id1, id2, cell,
                list_reduce([CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(e1.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM pairs JOIN emb e1 ON id1 = e1.vec_id
                    JOIN emb e2 ON id2 = e2.vec_id)
       SELECT id1, id2, cell, ROUND(cosine, 6) AS cos_r
       FROM scored WHERE cosine >= 0.45 ORDER BY id1, id2"""
  }

  private def semanticSql(cellBits: Int): String =
    s"""WITH ${ivfCteSql(cellBits)},
       pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2, a.cell
                 FROM assigned a JOIN assigned b
                   ON a.cell = b.cell AND a.vec_id < b.vec_id),
       scored AS (
         SELECT id1, id2, cell,
                list_reduce([CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(e1.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM pairs JOIN embeddings e1 ON id1 = e1.vec_id
                    JOIN embeddings e2 ON id2 = e2.vec_id)
       SELECT id1, id2, cell, ROUND(cosine, 6) AS cos_r
       FROM scored WHERE cosine >= 0.45 ORDER BY id1, id2"""

  /** Contrastive hard-negative mining — the retrieval-training composition
    * of the ANN machinery: for each query vector, the k highest-cosine
    * candidates that are NOT near-duplicates (cosine < `dupCos`, q107's
    * semantic-dedup threshold). Dups/positives train nothing; random
    * negatives are too easy; the value is exactly this "most similar but
    * not the same" band, mined per query.
    *
    * Shape: q84's multi-probe candidate generation (home bucket + one-bit
    * flips per table — recall floor without re-hashing the corpus), exact
    * rescoring on candidates only, the dup exclusion as a per-candidate
    * filter BEFORE the top-k window. Both engines compute identical
    * buckets from the shared plane literals, so the output hash-matches.
    *
    * Scale: inherits q84's candidate volume (probes · n / 2^bits per
    * table); exclusion adds zero shuffles; per-query top-k is
    * WindowGroupLimit-pruned. At corpus growth the bits dial (q101/q111
    * lesson) holds candidate volume flat.
    */
  def hardNegatives(emb: DataFrame, k: Int = 5, dupCos: Double = 0.45,
                    nQueries: Int = 20): DataFrame = {
    val e = emb
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val tabbed = e
      .select(col("vec_id"), posexplode(
        expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb"))).as(Seq("tbl", "bucket")))
    val probes = tabbed.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("tbl"), explode(
        expr("array(bucket, bucket ^ 8, bucket ^ 4, bucket ^ 2, bucket ^ 1)")).as("bucket"))
    val cands = broadcast(probes.as("q"))
      .join(tabbed.as("n"),
        col("q.tbl") === col("n.tbl") && col("q.bucket") === col("n.bucket") &&
          col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"))
      .distinct()
    cands
      .join(broadcast(e.filter(col("vec_id") < nQueries).withColumnRenamed("emb", "q_emb")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .join(e.withColumnRenamed("emb", "n_emb"), col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("graft_dot(q_emb, n_emb)").as("cosine"))
      .filter(col("cosine") < dupCos) // dup/positive exclusion, pre-window
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  def q124HardNegatives(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    hardNegatives(t(s, dir, "embeddings"))
  }

  /** q84's oracle with the dup-exclusion predicate before the ranking. */
  def q124Sql: String = {
    val sig = graft.functions.Hyperplanes.duckBucketsSql("embedding")
    val nt = graft.functions.Hyperplanes.tables
    s"""WITH sig AS (SELECT vec_id, $sig AS sig FROM embeddings),
       cands AS (
         SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
         FROM sig q JOIN sig n ON q.vec_id <> n.vec_id
         WHERE q.vec_id < 20
           AND list_contains([n.sig[i] = q.sig[i] OR n.sig[i] = xor(q.sig[i], 8)
                              OR n.sig[i] = xor(q.sig[i], 4) OR n.sig[i] = xor(q.sig[i], 2)
                              OR n.sig[i] = xor(q.sig[i], 1)
                              FOR i IN generate_series(1, $nt)], true)),
       scored AS (
         SELECT c.query_id, c.neighbor_id,
                list_reduce([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(a.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM cands c JOIN embeddings a ON c.query_id = a.vec_id
                      JOIN embeddings b ON c.neighbor_id = b.vec_id)
       SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cos_r FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         FROM scored WHERE cosine < 0.45)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** Hybrid retrieval — lexical BM25 + dense cosine, fused by Reciprocal
    * Rank Fusion (Cormack et al., SIGIR'09): the two-tower serving shape
    * every modern retrieval stack runs. Each ranker contributes
    * round(1e6 / (60 + rank)) micro-units for documents in its top-`pool`
    * list (0 outside it); candidates are the union of the two lists; the
    * fused top-`k` is ranked on the exact integer sum. doc_id and vec_id
    * are 1:1 in the fixtures (FIXTURES.md), standing in for a corpus with
    * both a text and an embedding column.
    *
    * Scale: the lexical side is q117's shape (term filter cuts the token
    * stream map-side, df/stats broadcast); the dense side is one
    * broadcast query vector against a streaming corpus scan with
    * TakeOrderedAndProject top-pool; fusion joins two pool-sized lists —
    * driver-free, shuffle cost independent of corpus size. RRF needs no
    * score calibration across rankers (rank-only), which is exactly why
    * it's the robust default at 100 TB where BM25 mass and cosine scales
    * drift per shard.
    */
  def hybridRetrieval(docs: DataFrame, emb: DataFrame,
                      qterms: Seq[String], queryVec: Long = 0L,
                      pool: Int = 20, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = TextAnalysis.bm25Scores(docs, qterms)
      .filter(col("doc_id") =!= queryVec)
      .orderBy(col("sfx").desc, col("doc_id").asc).limit(pool)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("sfx").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val e = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val dense = e.filter(col("vec_id") =!= queryVec).as("n")
      .crossJoin(broadcast(e.filter(col("vec_id") === queryVec)
        .select(col("emb").as("q_emb"))))
      .select(col("n.vec_id").as("doc_id"),
        expr("graft_dot(emb, q_emb)").as("cosine"))
      .orderBy(col("cosine").desc, col("doc_id").asc).limit(pool)
      .withColumn("dense_rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("dense_rank"))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr("CAST(ROUND(1000000.0 / (60 + lex_rank)) AS BIGINT)"), lit(0L)) +
          coalesce(expr("CAST(ROUND(1000000.0 / (60 + dense_rank)) AS BIGINT)"), lit(0L)))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_micro").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("doc_id"), col("rrf_micro"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0L)).as("dense_rank"))
      .orderBy(col("rank"))
  }

  def q125HybridRetrieval(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    hybridRetrieval(t(s, dir, "documents"), t(s, dir, "embeddings"),
      Seq("spark", "merge", "window"))
  }

  /** Both ranker replicas verbatim (q117's BM25 CTEs; q55's exact dot),
    * same integer RRF arithmetic.
    */
  val q125Sql: String =
    """WITH dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                   FROM documents),
       stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tot FROM dl),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
              WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
       df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       c AS (SELECT doc_id,
                    CAST(ROUND(LN((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                               * (tf * 2.2)
                               / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(tot AS DOUBLE) / n)))
                               * 1000000) AS BIGINT) AS fx
             FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats),
       sc AS (SELECT doc_id, SUM(fx) AS sfx FROM c WHERE doc_id <> 0 GROUP BY 1),
       lex AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY sfx DESC, doc_id) AS BIGINT)
                       AS lex_rank
               FROM sc ORDER BY sfx DESC, doc_id LIMIT 20),
       dq AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       dense0 AS (SELECT vec_id AS doc_id,
                         list_reduce([CAST(n.embedding[i] AS DOUBLE) * CAST(dq.q_emb[i] AS DOUBLE)
                                      FOR i IN generate_series(1, len(n.embedding))],
                                     (acc, v) -> acc + v) AS cosine
                  FROM embeddings n, dq WHERE n.vec_id <> 0),
       dense AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT)
                        AS dense_rank
                 FROM dense0 ORDER BY cosine DESC, doc_id LIMIT 20),
       fused AS (
         SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
                COALESCE(CAST(ROUND(1000000.0 / (60 + l.lex_rank)) AS BIGINT), 0)
                  + COALESCE(CAST(ROUND(1000000.0 / (60 + d.dense_rank)) AS BIGINT), 0)
                  AS rrf_micro,
                COALESCE(l.lex_rank, 0) AS lex_rank,
                COALESCE(d.dense_rank, 0) AS dense_rank
         FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id),
       ranked AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
                         AS rank, doc_id, rrf_micro, lex_rank, dense_rank
                  FROM fused)
       SELECT rank, doc_id, rrf_micro, lex_rank, dense_rank
       FROM ranked WHERE rank <= 10 ORDER BY rank"""

  // ---------------------------------------------------------------------
  // Persisted ANN index + incremental maintenance (VERDICT r6 item 6):
  // the nightly-ingest shape every production vector store needs. q94
  // proved the cross-batch discipline for shingle dedup; this is the same
  // pattern for embeddings — the corpus's LSH signatures live in a
  // PERSISTED table, a new batch probes those buckets without re-hashing
  // (or re-shuffling) the corpus, and the batch's own signatures append
  // into the index afterwards so tomorrow's batch probes today's corpus.
  // ---------------------------------------------------------------------

  /** Build the corpus side of the persisted index: one (vec_id, emb, tbl,
    * bucket) row per vector per hyperplane table, written
    * `partitionBy(tbl, bucket)` so a probe's bucket lookups become
    * PARTITION PRUNING at the scan — a nightly batch touching b buckets
    * reads b directories, not the index. `mode=append` is the maintenance
    * path: a new batch's signatures drop new files into the matching
    * bucket directories without rewriting anything (the LSH analogue of a
    * log-structured index segment; compact with [[Layout]] when small
    * files accumulate).
    *
    * The VECTOR lives in the bucket row — the classic space-for-time LSH
    * index layout: a probe's pruned scan delivers candidate ids AND their
    * embeddings in one read, so scoring needs no second corpus join. The
    * price is L× vector duplication in the index (here 16×); the sf1
    * probe showed the alternative — keeping the index id-only and joining
    * candidates back to the corpus table for vectors — is the part that
    * does NOT scale: the candidate×vector attach is either a corpus
    * shuffle or a candidate-frame broadcast that grows past driver limits
    * (1.8 GiB at a mere 10× corpus). At extreme scale, trade back with a
    * bucket-co-partitioned side table instead of inlining.
    *
    * `vecs` must carry (vec_id, emb) with emb already cast to
    * Array[Double] (the shared [[graft.functions.Hyperplanes]] plane set
    * hashes doubles). Signature cost is 64 codegen'd dots per vector —
    * paid ONCE per vector's lifetime, here, never again at probe time.
    */
  def annIndexWrite(vecs: DataFrame, path: String,
                    mode: String = "overwrite",
                    bitsPerTable: Int = graft.functions.Hyperplanes.bits,
                    numTables: Int = graft.functions.Hyperplanes.tables): Unit = {
    graft.functions.VectorExpressions.register(vecs.sparkSession)
    // Geometry discipline (VERDICT r8 item 4): an append into an index
    // hashed with a DIFFERENT geometry would silently produce bucket ids
    // that never collide with the resident rows — fail fast instead.
    if (mode == "append") {
      indexGeometry(vecs.sparkSession, path) match {
        case Some(existing) =>
          require(existing == ((bitsPerTable, numTables)),
            s"append geometry ($numTables x $bitsPerTable) != index geometry $existing at $path")
        case None if java.nio.file.Files.exists(java.nio.file.Paths.get(path)) =>
          // Data present but no geometry record: a pre-dial legacy index,
          // hashed at the compile-time default.
          val legacy = (graft.functions.Hyperplanes.bits, graft.functions.Hyperplanes.tables)
          require(legacy == ((bitsPerTable, numTables)),
            s"append geometry ($numTables x $bitsPerTable) != legacy index geometry $legacy at $path")
        case None => // fresh path: the first append CREATES the index.
      }
    }
    val grpBits = indexGrpBits(bitsPerTable)
    vecs
      .select(col("vec_id"), col("emb"), posexplode(
        expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb", bitsPerTable, numTables)))
        .as(Seq("tbl", "bucket")))
      .select(col("vec_id"), col("emb"), col("tbl").cast("int").as("tbl"),
        col("bucket").cast("int").as("bucket"))
      // Directory layer = (tbl, bucket GROUP), not (tbl, bucket): with the
      // geometry dial live, a dir per full bucket means tables × 2^bits
      // directories — measured at 16×14 bits as a ~32k-tiny-file tree
      // that took the sf0.1 build from 9 s to 157 s and the probe to 95 s
      // (file listing + one scan task per file dominate everything). The
      // low-order grpBits of the bucket give a BOUNDED fan-out
      // (tables × 2^grpBits dirs) whatever the geometry; the full bucket
      // stays a data column, sorted within each file so parquet row-group
      // min/max stats carry the residual selectivity.
      .withColumn("bgrp", col("bucket").bitwiseAND(lit((1 << grpBits) - 1)))
      // Compaction at write time (VERDICT r7 item 5): co-locate each
      // (tbl, bgrp) partition's rows in one task before the partitionBy
      // write, so every group directory receives exactly one file per
      // write instead of one per upstream task; the sort makes the
      // dynamic-partition writer see groups contiguously (one open file
      // at a time) and lays buckets out in sorted runs.
      .repartition(col("tbl"), col("bgrp"))
      .sortWithinPartitions(col("tbl"), col("bgrp"), col("bucket"))
      .write.mode(mode).partitionBy("tbl", "bgrp").parquet(path)
    // The geometry is PART OF THE INDEX (VERDICT r8 item 4): persisted as
    // a one-row parquet under `_geometry` (underscore-prefixed → invisible
    // to the main partitioned read, like _SUCCESS), so a probe hashes its
    // batch with whatever geometry the index was built with instead of a
    // compile-time constant. Written AFTER the main write because a
    // static-mode partitionBy overwrite clears the root first.
    vecs.sparkSession.range(1)
      .select(lit(bitsPerTable).as("bits"), lit(numTables).as("tables"))
      .write.mode("overwrite").parquet(s"$path/_geometry")
    Similarity.synchronized { builtIndexPaths += path }
  }

  /** Bucket-group directory fan-out for a geometry: 2^grpBits dirs per
    * table, capped so the bits dial can't explode the directory tree.
    * 4 keeps the tree at ≤ 16 × 16 = 256 dirs for every registered
    * geometry — measured at sf0.1: the 64-group layout (1024 dirs) still
    * paid ~7 s of listing + per-file task launch on the probe, 16 groups
    * brought it to 1.25 s (and the 16×14 build from 157 s to 2.9 s vs
    * full-bucket dirs). Partition pruning keeps a 16× cut per table for
    * small nightly batches; the full bucket stays a SORTED data column,
    * so row-group min/max stats carry the rest of the selectivity. At
    * corpus scales where a group dir outgrows one write task (100 TB
    * arithmetic: 9.6G index rows / 256 ≈ 37M rows/dir), step THIS dial
    * with log₂(corpus) like the bits dial — it is a pure layout
    * parameter, derived from the persisted geometry, so old indexes stay
    * readable.
    */
  private[graft] def indexGrpBits(bitsPerTable: Int): Int = math.min(bitsPerTable, 4)

  /** The persisted (bitsPerTable, numTables) of an index, if recorded.
    * Indexes written before the geometry dial (or by an interrupted run)
    * have none — callers treat that as the legacy 16×4 layout or rebuild.
    */
  def indexGeometry(s: SparkSession, path: String): Option[(Int, Int)] =
    try {
      val r = s.read.parquet(s"$path/_geometry").select(col("bits"), col("tables")).head()
      Some((r.getInt(0), r.getInt(1)))
    } catch { case _: Throwable => None }

  /** Resident-vector count of a persisted index (either family): a
    * partition-pruned ONE-table scan (every table holds the full resident
    * set), with the result-neutral crash-window duplicates compacted by
    * `distinct`. This is what the streaming auto-step policy
    * ([[graft.streaming.AnnIngest.PqAutoStepIngest]]) reads ONCE per
    * stream start to seed its in-memory counter — not per batch, so
    * ingest cost stays O(batch).
    */
  def annIndexResidentCount(s: SparkSession, path: String): Long =
    s.read.parquet(path).filter(col("tbl") === 0)
      .select(col("vec_id")).distinct().count()

  /** Index dirs created this JVM, removed by a shutdown hook — Bench and
    * Verify runs no longer accumulate stale `graft_ann_index_*` trees in
    * java.io.tmpdir (VERDICT r7 item 5).
    */
  private val builtIndexPaths = scala.collection.mutable.Set[String]()
  sys.addShutdownHook {
    builtIndexPaths.foreach { p =>
      try deleteTree(p) catch { case _: Throwable => () }
    }
  }

  /** Build the q140 fixture index for `dir`'s corpus split if no complete
    * one exists (a `_SUCCESS` marker gates reuse — a killed run's partial
    * write is rebuilt, a prior complete write over the same immutable SF
    * dir is reused as-is). Returns the index path. This is what makes the
    * registered q140 a PROBE measurement: the nightly build cost lives in
    * the separately-registered q144 maintenance entry, not inside every
    * timed probe (VERDICT r7 item 5).
    */
  private def ensureQ140Index(s: SparkSession, dir: String,
                              bitsPerTable: Int, numTables: Int): String = {
    val path = annIndexPath(dir)
    // _SUCCESS alone isn't enough: a complete index written by an OLDER
    // schema (id-only rows, before vectors moved into the bucket files)
    // or an older GEOMETRY (pre-dial 16×4, or a different dial setting)
    // must be rebuilt, not probed — tmpdir survives a killed JVM whose
    // cleanup hook never ran.
    // bgrp: the bucket-group layout marker — a stale full-bucket
    // partitioned tree (pre-group-layer) must also rebuild.
    val done = java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")) &&
      (try {
        val fields = s.read.parquet(path).schema.fieldNames
        fields.contains("emb") && fields.contains("bgrp")
      } catch { case _: Throwable => false }) &&
      indexGeometry(s, path).contains((bitsPerTable, numTables))
    if (!done) {
      val corpus = t(s, dir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .filter(col("vec_id") % 10 =!= 0)
      annIndexWrite(corpus, path, bitsPerTable = bitsPerTable, numTables = numTables)
    } else Similarity.synchronized { builtIndexPaths += path }
    path
  }

  /** Probe a persisted index with a new batch: hash ONLY the batch
    * (16 sign-bit signatures per probe vector), broadcast those bucket
    * keys against the index scan (the corpus side streams — no shuffle,
    * no re-hash; with partition pruning it doesn't even read untouched
    * buckets), score in place, and keep the per-probe top-5 — the same
    * deterministic tail as q56, so the result is bit-reproducible and
    * DuckDB-checkable.
    *
    * Scoring reads the neighbor vector FROM the index row itself (see
    * [[annIndexWrite]]) and the query vector from a broadcast of the
    * batch — small by definition; it's the nightly increment. So the
    * whole probe is: pruned index scan → two broadcast hash joins → dot →
    * pair dedup on the 24-byte scored tuple → per-query top-5. No corpus
    * join, no candidate-frame broadcast, no driver-side collect anywhere
    * — the first sf1 run of the id-only layout died at exactly that spot
    * (a 1.8 GiB candidate broadcast exceeding maxResultSize). The dot is
    * computed before the dedup shuffle on purpose: a pair surfacing in
    * k ≤ 16 tables costs k redundant 128-mult dots but ships 24-byte
    * rows, where deduping first would ship the 1 KB vector per candidate.
    */
  def annIndexProbe(s: SparkSession, indexPath: String,
                    newVecs: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val index = s.read.parquet(indexPath)
    // Hash the batch with the geometry THE INDEX RECORDS — not a
    // compile-time constant (VERDICT r8 item 4): a probe hashed at a
    // different (bits, tables) would silently miss every resident bucket.
    // Indexes without a geometry record are the legacy 16×4 layout.
    val (bitsPerTable, numTables) = indexGeometry(s, indexPath)
      .getOrElse((graft.functions.Hyperplanes.bits, graft.functions.Hyperplanes.tables))
    val probeSigs = newVecs
      .select(col("vec_id"), posexplode(
        expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb", bitsPerTable, numTables)))
        .as(Seq("tbl", "bucket")))
      .select(col("vec_id"), col("tbl").cast("int").as("tbl"),
        col("bucket").cast("int").as("bucket"))
      // The directory key (see annIndexWrite's group layer): joining on
      // it too lets dynamic partition pruning skip group dirs the batch
      // never hashes into — the win for genuinely small nightly batches.
      .withColumn("bgrp", col("bucket")
        .bitwiseAND(lit((1 << indexGrpBits(bitsPerTable)) - 1)))
    broadcast(probeSigs.as("q"))
      .join(index.as("n"),
        col("q.tbl") === col("n.tbl") && col("q.bgrp") === col("n.bgrp") &&
          col("q.bucket") === col("n.bucket") &&
          col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"),
        col("n.emb").as("n_emb"))
      .join(broadcast(newVecs.select(col("vec_id"), col("emb").as("q_emb"))),
        col("query_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("graft_dot(q_emb, n_emb)").as("cosine"))
      .distinct()
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic per-corpus index location (tmpdir-scoped so Verify and
    * Bench runs over different SF dirs never collide).
    */
  def annIndexPath(dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_ann_index_${Integer.toHexString(dir.hashCode)}"

  /** Registered end-to-end posture: split embeddings into an existing
    * corpus (vec_id % 10 != 0) and a new batch (vec_id % 10 == 0, the
    * q94 fixture convention), and probe the PERSISTED corpus index with
    * the batch. The DuckDB oracle recomputes ALL signatures from scratch
    * — a hash match therefore proves persisted-index candidates ==
    * recompute-from-scratch candidates, which is the whole correctness
    * claim of an incremental index.
    *
    * The index is built lazily ONCE per SF dir ([[ensureQ140Index]]) and
    * the timed query measures the PROBE — batch hash + DPP bucket reads +
    * broadcast scoring — which is the nightly cost the design exists to
    * minimize. Round 7 timed 3 full index rebuilds inside every bench
    * measurement, misrepresenting that cost ~10×; the build is now its
    * own registered maintenance entry (q144) so both sides of the
    * amortization stay measured (VERDICT r7 item 5).
    */
  /** Registered index geometry: HELD-L 16 tables × 14 bits — the
    * b ≈ log₂(n) posture of the 100×-ready decade (VERDICT r8 item 4:
    * the hard-coded 16×4 layout was the densest geometry in the repo and
    * the reason q140 sat in the dying family at sf10). The probe itself
    * reads the geometry from the index's `_geometry` record, so this
    * constant exists only on the BUILD side.
    */
  private val q140Geometry: (Int, Int) = (14, 16)

  def q140AnnIndexProbe(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val path = ensureQ140Index(s, dir, q140Geometry._1, q140Geometry._2)
    annIndexProbe(s, path, emb.filter(col("vec_id") % 10 === 0))
  }

  /** The MAINTENANCE side of q140, registered separately so the nightly
    * build/append cost is measured on its own instead of inside every
    * probe: rebuild the corpus index from scratch (the worst-case
    * maintenance op — a real nightly pays only an append of the new
    * batch, proven equivalent by DedupSpec's append-vs-rebuild test) and
    * return per-table occupancy stats. The stats double as the oracle
    * surface: DuckDB recomputes the same signatures and must agree on
    * every table's bucket count and row count — a full structural check
    * of the persisted index content without shipping parquet bytes to
    * the oracle. Marked in `SparkEntry.auditBaselines` so scale tooling
    * knows this entry is intentionally corpus-scale work.
    */
  def q144AnnIndexBuild(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val corpus = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .filter(col("vec_id") % 10 =!= 0)
    val path = annIndexPath(dir)
    annIndexWrite(corpus, path, bitsPerTable = q140Geometry._1, numTables = q140Geometry._2)
    s.read.parquet(path)
      .groupBy(col("tbl"))
      .agg(countDistinct(col("bucket")).as("n_buckets"), count(lit(1)).as("n_rows"))
      .orderBy(col("tbl"))
  }

  def q144Sql: String = {
    val sig = graft.functions.Hyperplanes.duckBucketsSql(
      "embedding", q140Geometry._1, q140Geometry._2)
    val nt = q140Geometry._2
    s"""WITH sig AS (SELECT vec_id, $sig AS sig FROM embeddings WHERE vec_id % 10 <> 0)
       SELECT CAST(t.i - 1 AS INT) AS tbl,
              COUNT(DISTINCT sig[t.i]) AS n_buckets,
              COUNT(*) AS n_rows
       FROM sig, generate_series(1, $nt) AS t(i)
       GROUP BY 1 ORDER BY 1"""
  }

  /** DuckDB replica of q140 — NO index anywhere: both sides' signatures
    * recomputed from the shared plane literals, candidates from the same
    * ≥1-table collision rule restricted to new×corpus, identical scoring
    * fold and tie-break. Equality with the Spark side is the
    * index-consistency proof.
    */
  def q140Sql: String = {
    val sig = graft.functions.Hyperplanes.duckBucketsSql(
      "embedding", q140Geometry._1, q140Geometry._2)
    val nt = q140Geometry._2
    s"""WITH sig AS (SELECT vec_id, $sig AS sig FROM embeddings),
       cands AS (
         SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
         FROM sig q JOIN sig n ON q.vec_id <> n.vec_id
         WHERE q.vec_id % 10 = 0 AND n.vec_id % 10 <> 0
           AND list_contains([q.sig[i] = n.sig[i] FOR i IN generate_series(1, $nt)], true)),
       scored AS (
         SELECT c.query_id, c.neighbor_id,
                list_reduce([CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(a.embedding))],
                            (acc, v) -> acc + v) AS cosine
         FROM cands c JOIN embeddings a ON c.query_id = a.vec_id
                      JOIN embeddings b ON c.neighbor_id = b.vec_id)
       SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cos_r FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         FROM scored)
       WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** q154 — product-quantization ANN with ADC (asymmetric distance
    * computation): the memory-bound corpus layout a 100 TB vector store
    * actually serves from, and the one quantization family the repo did
    * not yet carry (q87's int8 codes are 1 byte/DIM — 64 B/vector; PQ is
    * 4 bits/SUBSPACE — 4 B/vector, a 16× further compression, at the cost
    * of a trained codebook).
    *
    * Training is the repo's deterministic one-Lloyd-step recipe
    * (q58/q107/q150 lineage), applied per subspace: the 64-dim embedding
    * splits into M=8 subvectors of 8 dims; subspace m's 16-cell seed
    * partition is the 4 sign bits of the [[graft.functions.Hyperplanes]]
    * PQ sub-planes (pool rows 448–451 sliced to the subspace's dims —
    * disjoint from every LSH geometry); cell centroids are fixed-point
    * integer means (order-independent, bit-identical under any
    * partitioning and in DuckDB); each subvector is then assigned to its
    * max-dot centroid (tie → lowest cell) — one exact Lloyd step from a
    * deterministic initialization, zero training loop, fully
    * oracle-checkable.
    *
    * Serving shape (what scales): the corpus is represented ONLY by its
    * code array — 8 nibbles/vector. Each probe precomputes a 128-entry
    * lookup table LUT[m·16+k] = dot(q_sub_m, centroid_{m,k}) (the ADC
    * trick: the approximate score of ANY corpus vector is then 8 array
    * lookups + 7 adds, no float vector touched), the 20 LUTs broadcast,
    * and the scan is one codegen'd fold over the broadcast LUT per
    * (query, vector) — linear, shuffle-free until the per-query
    * shortlist window. Only the 32-deep shortlist per query reads float vectors
    * again for the exact rerank (q87's serving discipline). At 100 TB:
    * codes live hot (4 GB per billion vectors), floats stay cold on
    * parquet, LUT size is queries×1 KB — the standard IVF-PQ serving
    * stack minus the IVF routing, which q58/q150 already provide and
    * composes by restricting the scan to probed cells.
    *
    * ADC fidelity is audited in-row: `adc_r` (the quantized score that
    * RANKED the shortlist) is emitted next to `cos_r` (the exact rerank
    * score), so the oracle hash pins the full approximate pipeline — LUT
    * folds, code assignment, shortlist membership — not just the final
    * ids. PqSpec additionally pins ADC == dot(query, decode(codes)) and
    * the recall floor vs the q55 exact baseline.
    */
  /** The PQ model of q154, exposed for PqSpec: `(cents, codes)` where
    * cents = (m, cell, centroid array<double>) — the per-subspace
    * codebook — and codes = (vec_id, codes array<int>) — each corpus
    * vector's M nibbles. Deterministic (seed partition + integer-mean
    * centroids + tie-to-lowest assignment), so the spec can decode and
    * recompute ADC independently of the serving path.
    */
  private[graft] def pqModel(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    graft.functions.VectorExpressions.register(s)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    pqModelOn(emb)
  }

  /** [[pqModel]] over an arbitrary (vec_id, emb array<double>) frame —
    * q154/q155 train on raw embeddings, q156 on coarse-cell residuals.
    */
  private[graft] def pqModelOn(emb: DataFrame,
                               pqBits: Int = graft.functions.Hyperplanes.pqBits): (DataFrame, DataFrame) = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val subs = pqSubsOf(emb)
    // Seed partition + fixed-point centroids (the q58 integer-mean trick,
    // per (subspace, cell) instead of per cell). Pinned (≤ M·2^pqBits
    // tiny rows, r13): the codebook is consumed at least twice (encode
    // broadcast + the caller's LUT build), and every un-pinned reference
    // re-ran the corpus-scale training aggregation (guide §2.4).
    val seeded = subs.withColumn("cell0", expr(H.sparkSubCellExpr("sub", "m", pqBits)))
    val cents = StorageHandle.sessionDefault().pin(seeded
      .select(col("m"), col("cell0"), posexplode(
        expr("transform(sub, x -> CAST(ROUND(x * 10000000) AS BIGINT))")).as(Seq("dim", "fx")))
      .groupBy(col("m"), col("cell0"), col("dim"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
      .groupBy(col("m"), col("cell0"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, sfx, n))), e -> CAST(e.sfx AS DOUBLE) / e.n / 10000000)").as("centroid"))
      .select(col("m"), col("cell0").as("cell"), col("centroid")))
    (cents, pqEncode(emb, cents))
  }

  /** Subvectors of an (vec_id, emb array<double>) frame: one row per
    * (vector, subspace), sub = the pqSubDim-dim slice.
    */
  private[graft] def pqSubsOf(emb: DataFrame): DataFrame = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    emb.select(col("vec_id"),
      posexplode(expr(s"transform(sequence(0, ${M - 1}), mm -> slice(emb, mm * ${H.pqSubDim} + 1, ${H.pqSubDim}))"))
        .as(Seq("m", "sub")))
  }

  /** One-row broadcast form of a flat PQ codebook: `cents_arr[m + 1]` =
    * subspace m's candidate list array<struct<cell int, cent
    * array<double>>>, cell ascending. A ≤ M·2^pqBits-row aggregation —
    * independent of corpus size.
    */
  private def pqCentsRow(cents: DataFrame): DataFrame =
    cents.groupBy(col("m"))
      .agg(expr("transform(array_sort(collect_list(struct(cell, centroid))), e -> named_struct('cell', e.cell, 'cent', e.centroid))").as("cands"))
      .agg(expr("transform(array_sort(collect_list(struct(m, cands))), e -> e.cands)").as("cents_arr"))

  /** Encode: one Lloyd step — max-dot centroid per (vector, subspace),
    * tie to the lowest cell. r13: ONE map-only projection per corpus row
    * — M `graft_argmax_dot` evals (hand-evaluated tight loops, see
    * [[graft.functions.ArgmaxDotExpr]]) against the one-row broadcast
    * codebook, replacing the (vector, subspace, cell) explosion and the
    * corpus-scale SortAggregate pair its struct-ordered max_by forced
    * (plus the ObjectHashAggregate codes reassembly). Ordering parity:
    * the expression IS max_by(cell, struct(sc, -cell)) — argued in its
    * scaladoc, pinned by PqSpec. Still factored from [[pqModelOn]] so
    * the PQ index write can encode an APPEND batch against the index's
    * persisted codebook — the incremental-maintenance discipline (a
    * retrained codebook would silently shift every resident code).
    * Takes the (vec_id, emb) frame — the subs explode itself was a
    * third of the old encode's rows.
    */
  private[graft] def pqEncode(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(pqCentsRow(cents)))
      .select(col("vec_id"), expr(pqEncodeExprStr).as("codes"))

  /** The flat-encode codes expression over a frame carrying `emb` and
    * [[pqCentsRow]]'s `cents_arr` — exposed so a caller that needs other
    * per-row model expressions in the SAME projection (q155/q156's
    * corpus rows carry their IVF cell beside the codes) can avoid a
    * second encode pass + re-join.
    */
  private def pqEncodeExprStr: String = {
    val H = graft.functions.Hyperplanes
    s"""transform(sequence(0, ${H.pqM - 1}), mm ->
       graft_argmax_dot(slice(emb, mm * ${H.pqSubDim} + 1, ${H.pqSubDim}),
                        element_at(cents_arr, mm + 1)))"""
  }

  def q154AnnPqAdc(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val H = graft.functions.Hyperplanes
    val W = org.apache.spark.sql.expressions.Window
    val M = H.pqM
    val K = 1 << H.pqBits
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val (cents, codes) = pqModel(s, dir)
    val lut = pqLutDf(emb, cents)
    // ADC scan: 8 lookups + 7 adds per (query, vector) against the
    // broadcast LUTs — the corpus side streams its 4-byte codes once.
    val adc = codes.crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(s"aggregate(sequence(0, ${M - 1}), CAST(0 AS DOUBLE), (acc, mm) -> acc + lut[mm * $K + codes[mm]])").as("adc"))
    pqAdcRerank(emb, adc)
  }

  /** Per-probe ADC lookup tables for the PQ codebook `cents`:
    * LUT[m·K + k] = dot(q_sub_m, c_{m,k}) — one 128-double array per
    * probe, ordered (m, cell) ascending so the serving fold indexes it
    * directly.
    */
  private def pqLutDf(emb: DataFrame, cents: DataFrame,
                      pqBits: Int = graft.functions.Hyperplanes.pqBits,
                      queryFilter: Column = col("vec_id") < 20): DataFrame = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val K = 1 << pqBits
    // The codebook is SPARSE: a (m, cell) seed pattern no vector hits has
    // no centroid (q156's residual cells can be empty at some SFs). The
    // LUT must still be a DENSE M×K array — the serving fold indexes it
    // m·K + code positionally — so absent entries pin 0.0 explicitly.
    // Densify the CODEBOOK (an M×K grid left-joined to cents, tiny and
    // query-independent) rather than each query's lookup map: the first
    // formulation assembled the dense array with try_element_at over a
    // 2048-entry MAP per slot — a linear scan, O((M·K)²) per query —
    // invisible at q154's 20 probes, measured as the q164 batch probe's
    // dominant cost at 6k probes. Here every query gets exactly M·K
    // (slot, lv) rows (absent cells pin lv = 0.0 without a dot) and the
    // dense array is one positional sort-assemble, the codes-assembly
    // idiom.
    val grid = emb.sparkSession.range(M.toLong * K)
      .select((col("id") / K).cast("int").as("m"), (col("id") % K).cast("int").as("cell"))
    val denseCents = grid.join(cents, Seq("m", "cell"), "left")
    emb.filter(queryFilter)
      .select(col("vec_id").as("query_id"),
        posexplode(expr(s"transform(sequence(0, ${M - 1}), mm -> slice(emb, mm * ${H.pqSubDim} + 1, ${H.pqSubDim}))"))
          .as(Seq("m", "qsub")))
      .join(broadcast(denseCents), Seq("m"))
      .select(col("query_id"), (col("m") * K + col("cell")).cast("int").as("slot"),
        when(col("centroid").isNull, lit(0.0d))
          .otherwise(expr("graft_dot(qsub, centroid)")).as("lv"))
      .groupBy(col("query_id"))
      .agg(expr("transform(array_sort(collect_list(struct(slot, lv))), e -> e.lv)").as("lut"))
  }

  /** The PQ serving tail shared by q154/q155: 32-deep per-query ADC
    * shortlist (rerank depth ≈ 6×k — the float-vector reads stay bounded
    * at queries×32 rows while the 4-bit codes' ranking noise is absorbed;
    * measured recall vs the exact q55 top-5 at sf0.001: 0.27 at depth 10
    * → 0.47 at depth 32), then the exact top-5 rerank, with the adc score
    * that ranked the shortlist emitted next to the exact cosine.
    */
  private def pqAdcRerank(emb: DataFrame, adc: DataFrame): DataFrame =
    pqAdcRerankOn(emb.filter(col("vec_id") < 20), emb, adc)

  /** [[pqAdcRerank]] with the two float stores split: `queryEmb` is the
    * (small, broadcast) probe side, `corpusEmb` the cold neighbor-vector
    * store the shortlist reads from — the q164 index probe reranks
    * against the corpus floats that deliberately do NOT live in its
    * PQ-coded index rows.
    */
  private def pqAdcRerankOn(queryEmb: DataFrame, corpusEmb: DataFrame,
                            adc: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val short = adc
      .withColumn("srn", row_number().over(
        W.partitionBy(col("query_id")).orderBy(col("adc").desc, col("neighbor_id").asc)))
      .filter(col("srn") <= 32)
    short
      .join(corpusEmb.as("ne"), col("neighbor_id") === col("ne.vec_id"))
      .join(broadcast(queryEmb.as("qe")), col("query_id") === col("qe.vec_id"))
      .select(col("query_id"), col("neighbor_id"), col("adc"),
        expr("graft_dot(qe.emb, ne.emb)").as("cosine"))
      .withColumn("rank", row_number().over(
        W.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cos_r"), round(col("adc"), 6).as("adc_r"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q155 — IVF-PQ: the composition the q154 scaladoc names, and the
    * standard serving stack of every billion-scale vector store (FAISS
    * IVFPQ, SCANN's tree-AH): the IVF coarse quantizer (q58's
    * deterministic 16-cell Lloyd step) ROUTES each probe to its nProbe=4
    * nearest cells, and the PQ-ADC scan (q154's broadcast LUTs over
    * 4-byte nibble codes) scores ONLY the routed cells' vectors — the
    * full-corpus linear ADC scan of q154 drops to ~nProbe/k of the
    * corpus with no new shuffle: the corpus keeps its one (cell, codes)
    * row per vector, probe cells broadcast, LUTs broadcast, and the
    * only exchange is the per-query shortlist window on narrow
    * (query_id, neighbor_id, adc) triples.
    *
    * At 100 TB this is the layout that serves: cells partition the code
    * table (so a probe prunes partitions, the q140 index discipline),
    * codes are 4 B/vector hot data, floats stay cold for the 32-deep
    * rerank. Everything is deterministic — seed cells, integer-mean
    * centroids, tie-to-lowest assignments on both quantizers — so DuckDB
    * replays the entire approximate pipeline bit-identically.
    */
  def q155AnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val K = 1 << H.pqBits
    val nProbe = 4
    // r13: routing is the per-row expression form (graft_argmax_dot /
    // graft_top_dots — ivfRanked's rn = 1 / rn <= nProbe exactly), and
    // the corpus row computes its cell in the SAME projection as its
    // codes (both are per-row functions of emb against one-row
    // broadcast models), so the n·2^cellBits ranking window AND the
    // codes⋈assignment join disappear (guide §2.4).
    val (emb, ivfCents, _) = ivfModel(s, dir)
    val ivfRow = ivfCentsRow(ivfCents)
    val (cents, _) = pqModelOn(emb)
    // Corpus row: (vec_id, codes, cell) — the persisted IVF-PQ layout.
    val corpus = emb.crossJoin(broadcast(pqCentsRow(cents)))
      .crossJoin(broadcast(ivfRow))
      .select(col("vec_id"), expr(pqEncodeExprStr).as("codes"),
        expr("graft_argmax_dot(emb, cands)").as("cell"))
    val probeCells = emb.filter(col("vec_id") < 20)
      .crossJoin(broadcast(ivfRow))
      .select(col("vec_id").as("query_id"),
        explode(expr(s"graft_top_dots(emb, cands, $nProbe)")).as("p"))
      .select(col("query_id"), col("p.cell").as("cell"))
    val lut = pqLutDf(emb, cents)
    // Routed ADC scan: the broadcast probe-cell list prunes the corpus
    // to ~nProbe/k before any scoring; a (query, vector) pair appears at
    // most once (one cell per vector, distinct cells per probe).
    val adc = corpus.join(broadcast(probeCells), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(lut), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(s"aggregate(sequence(0, ${M - 1}), CAST(0 AS DOUBLE), (acc, mm) -> acc + lut[mm * $K + codes[mm]])").as("adc"))
    pqAdcRerank(emb, adc)
  }

  /** q156 — residual IVF-PQ (the FAISS-IVFADC refinement of q155): the
    * PQ codebook is trained on the coarse-cell RESIDUALS x − c(cell)
    * instead of the raw vectors. Residuals are what's left after the
    * coarse quantizer explains the cell-level structure, so the same
    * 4-byte code budget spends its 16 cells per subspace on a tighter
    * distribution — the standard way production IVF-PQ buys recall
    * without growing the code (measured at sf0.001: routed recall
    * 0.37 → 0.42 vs the exact top-5, at identical code bytes, routing,
    * and rerank depth; the full-scan ceiling q154 sits at 0.47).
    *
    * The ADC identity decomposes: score(q, x) ≈ ⟨q, c(cell)⟩ + ⟨q, r̂⟩
    * where r̂ is the decoded residual — the first term is one number per
    * (probe, probed cell) (already computed by the coarse quantizer's
    * ranking pass), the second is the same 8-lookup LUT fold as
    * q154/q155 against a LUT built from the residual codebook. One
    * shared residual codebook across cells (not per-cell codebooks)
    * keeps the broadcast at 128 entries and is the memory-bound variant
    * actually shipped at scale. Serving layout is identical to q155:
    * corpus = (cell, codes) rows, probe cells + LUTs + per-cell query
    * dots broadcast, shortlist window on narrow triples, 32-deep exact
    * rerank.
    */
  def q156AnnIvfPqResidual(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val K = 1 << H.pqBits
    val nProbe = 4
    // r13: assignment, residual subtraction, and probe routing are
    // per-row expressions against the one-row broadcast IVF codebook
    // (graft_argmax_dot / graft_top_dots — rn = 1 / rn <= nProbe with
    // the identical tie-break), so the n·2^cellBits ranking window, the
    // two joins that attached (cell, centroid) to the corpus, and the
    // separate ⟨q, c(cell)⟩ relation all collapse: the residual is
    // computed in the assignment's own projection (centroid looked up
    // from the broadcast candidate list — same doubles, so the
    // subtraction is bit-identical) and qc rides the probe list (the
    // same graft_dot fold on the same inputs).
    val (emb, ivfCents, _) = ivfModel(s, dir)
    val ivfRow = ivfCentsRow(ivfCents)
    val resid = emb.crossJoin(broadcast(ivfRow))
      .select(col("vec_id"), col("emb"), col("cands"),
        expr("graft_argmax_dot(emb, cands)").as("cell"))
      .select(col("vec_id"), col("cell"),
        expr("zip_with(emb, filter(cands, c -> c.cell = cell)[0].cent, (a, b) -> a - b)").as("remb"))
    val (rCents, _) = pqModelOn(resid.select(col("vec_id"), col("remb").as("emb")))
    // Corpus row (vec_id, cell, codes): the residual encode in one
    // projection, the cell carried through instead of re-joined.
    val corpus = resid.select(col("vec_id"), col("cell"), col("remb").as("emb"))
      .crossJoin(broadcast(pqCentsRow(rCents)))
      .select(col("vec_id"), col("cell"), expr(pqEncodeExprStr).as("codes"))
    val probeCells = emb.filter(col("vec_id") < 20)
      .crossJoin(broadcast(ivfRow))
      .select(col("vec_id").as("query_id"),
        explode(expr(s"graft_top_dots(emb, cands, $nProbe)")).as("p"))
      .select(col("query_id"), col("p.cell").as("cell"), col("p.d").as("qc"))
    val lut = pqLutDf(emb, rCents)
    val adc = corpus.join(broadcast(probeCells), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(lut), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(s"qc + aggregate(sequence(0, ${M - 1}), CAST(0 AS DOUBLE), (acc, mm) -> acc + lut[mm * $K + codes[mm]])").as("adc"))
    pqAdcRerank(emb, adc)
  }

  /** DuckDB replica of q154: identical sliced sub-planes (shared
    * literals), identical fixed-point centroids per (subspace, cell),
    * identical max-dot/lowest-cell assignment (ROW_NUMBER with the same
    * ordering), identical LUT fold and m-ascending ADC fold, identical
    * 32-deep shortlist and exact top-5 rerank.
    */
  /** PQ CTE prefix shared by q154Sql/q155Sql: subvectors → seed cells →
    * fixed-point sub-centroids → argmax codes → per-probe LUTs. Ends at
    * `lut` (query_id, 128-double list ordered (m, cell)).
    */
  private def pqCteSql: String = pqCteSql("embeddings", "embedding")

  /** [[pqCteSql]] over an arbitrary (vec_id, `vec`) corpus relation —
    * the LUT side always reads the RAW query embeddings (q156 scores raw
    * queries against the residual codebook).
    */
  private def pqCteSql(from: String, vec: String,
                       pqBits: Int = graft.functions.Hyperplanes.pqBits,
                       queryPred: String = "q.vec_id < 20"): String = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val sd = H.pqSubDim
    val cell0 = H.duckSubCellSql("sub", "m", pqBits)
    s"""subs AS (
         SELECT vec_id, m, $vec[m * $sd + 1 : m * $sd + $sd] AS sub
         FROM $from, generate_series(0, ${M - 1}) AS t(m)),
       seeded AS (SELECT vec_id, m, sub, $cell0 AS cell0 FROM subs),
       comps AS (SELECT m, cell0, i - 1 AS dim,
                        CAST(ROUND(CAST(sub[i] AS DOUBLE) * 10000000) AS BIGINT) AS fx
                 FROM seeded, generate_series(1, $sd) AS t(i)),
       sums AS (SELECT m, cell0, dim, SUM(fx) AS sfx, COUNT(*) AS n FROM comps GROUP BY 1, 2, 3),
       cent AS (SELECT m, cell0 AS cell, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS centroid
                FROM sums GROUP BY m, cell0),
       scored AS (
         SELECT s.vec_id, s.m, c.cell,
                list_reduce([CAST(s.sub[i] AS DOUBLE) * c.centroid[i]
                             FOR i IN generate_series(1, $sd)], (acc, v) -> acc + v) AS sc
         FROM subs s JOIN cent c ON s.m = c.m),
       assigned AS (
         SELECT vec_id, m, cell AS code FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY sc DESC, cell ASC) AS rn
           FROM scored) WHERE rn = 1),
       codes AS (SELECT vec_id, list(code ORDER BY m) AS codes FROM assigned GROUP BY vec_id),
       lutrows AS (
         SELECT q.vec_id AS query_id, c.m, c.cell,
                list_reduce([CAST(q.embedding[c.m * $sd + i] AS DOUBLE) * c.centroid[i]
                             FOR i IN generate_series(1, $sd)], (acc, v) -> acc + v) AS lv
         FROM embeddings q CROSS JOIN cent c WHERE $queryPred),
       lutgrid AS (
         SELECT q.vec_id AS query_id, mm.m, kk.cell
         FROM embeddings q, generate_series(0, ${M - 1}) AS mm(m),
              generate_series(0, ${(1 << pqBits) - 1}) AS kk(cell)
         WHERE $queryPred),
       lut AS (SELECT g.query_id, list(COALESCE(l.lv, 0.0) ORDER BY g.m, g.cell) AS lut
               FROM lutgrid g LEFT JOIN lutrows l
                 ON l.query_id = g.query_id AND l.m = g.m AND l.cell = g.cell
               GROUP BY g.query_id)"""
  }

  /** PQ tail shared by q154Sql/q155Sql: 32-deep ADC shortlist, exact
    * top-5 rerank, final projection — consumes an `adc` CTE of
    * (query_id, neighbor_id, adc).
    */
  private def pqTailSql: String =
    s"""short AS (
         SELECT query_id, neighbor_id, adc FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, neighbor_id ASC) AS srn
           FROM adc) WHERE srn <= 32),
       rer AS (
         SELECT s.query_id, s.neighbor_id, s.adc,
                list_reduce([CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE)
                             FOR i IN generate_series(1, len(qe.embedding))], (acc, v) -> acc + v) AS cosine
         FROM short s JOIN embeddings qe ON s.query_id = qe.vec_id
                      JOIN embeddings ne ON s.neighbor_id = ne.vec_id)
       SELECT query_id, rank, neighbor_id, ROUND(cosine, 6) AS cos_r, ROUND(adc, 6) AS adc_r FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         FROM rer)
       WHERE rank <= 5 ORDER BY query_id, rank"""

  def q154Sql: String = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val K = 1 << H.pqBits
    s"""WITH $pqCteSql,
       adc AS (
         SELECT l.query_id, c.vec_id AS neighbor_id,
                list_reduce([l.lut[mm * $K + c.codes[mm + 1] + 1]
                             FOR mm IN generate_series(0, ${M - 1})], (acc, v) -> acc + v) AS adc
         FROM lut l CROSS JOIN codes c WHERE l.query_id <> c.vec_id),
       $pqTailSql"""
  }

  /** DuckDB replica of q155: the q58 IVF CTEs (prefixed ivf_ to avoid
    * colliding with the PQ names) route each probe to its 4 nearest
    * cells; the ADC fold is q154's, restricted to routed (query, cell)
    * matches.
    */
  def q155Sql: String = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val K = 1 << H.pqBits
    val ivfCell0 = H.duckCellSqlN("embedding", 4)
    s"""WITH $pqCteSql,
       ivf_seeded AS (SELECT vec_id, embedding, $ivfCell0 AS cell0 FROM embeddings),
       ivf_comps AS (SELECT cell0, i - 1 AS dim,
                            CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS fx
                     FROM ivf_seeded, UNNEST(generate_series(1, len(embedding))) AS t(i)),
       ivf_sums AS (SELECT cell0, dim, SUM(fx) AS sfx, COUNT(*) AS n FROM ivf_comps GROUP BY 1, 2),
       ivf_cent AS (SELECT cell0 AS cell, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS centroid
                    FROM ivf_sums GROUP BY cell0),
       ivf_ranked AS (
         SELECT e.vec_id, c.cell,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                  list_reduce([CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]
                               FOR i IN generate_series(1, len(e.embedding))],
                              (acc, v) -> acc + v) DESC, c.cell ASC) AS rn
         FROM embeddings e CROSS JOIN ivf_cent c),
       ivf_assigned AS (SELECT vec_id, cell FROM ivf_ranked WHERE rn = 1),
       probecells AS (SELECT vec_id AS query_id, cell FROM ivf_ranked WHERE rn <= 4 AND vec_id < 20),
       adc AS (
         SELECT p.query_id, c.vec_id AS neighbor_id,
                list_reduce([l.lut[mm * $K + c.codes[mm + 1] + 1]
                             FOR mm IN generate_series(0, ${M - 1})], (acc, v) -> acc + v) AS adc
         FROM probecells p
              JOIN ivf_assigned a USING (cell)
              JOIN codes c ON a.vec_id = c.vec_id
              JOIN lut l ON l.query_id = p.query_id
         WHERE c.vec_id <> p.query_id),
       $pqTailSql"""
  }

  /** q159 — the PQ codebook dial, measured: q154's pipeline at 8 bits per
    * subspace (256-cell codebooks, 8 bytes/vector — FAISS's PQ8 default)
    * instead of 4 (16 cells, 4 B/vector). Everything else held: same
    * seed-plane prefix (rows 448–455; the 4-bit cells are the high nibble
    * of the 8-bit cells, so the dial is prefix-stable like the LSH pool),
    * same integer-mean training, same broadcast-LUT ADC serving (the LUT
    * grows to M·256 = 2048 doubles/probe — still broadcast-trivial), same
    * 32-deep exact rerank. The dial trades 2× code memory for recall:
    * measured at sf0.001 vs the exact q55 top-5, 0.47 (4-bit) → 0.73
    * (8-bit) — PqSpec pins the ordering. Encode cost rises to Θ(n·M·K)
    * dots; at K=256 that is the regime where a real deployment switches
    * the encoder to the hierarchical assignment q150 proved (√K×√K),
    * noted here so the falsification record's lesson carries over.
    */
  def q159AnnPq8(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val bits = 8
    val K = 1 << bits
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val (cents, codes) = pqModelOn(emb, pqBits = bits)
    val lut = pqLutDf(emb, cents, pqBits = bits)
    val adc = codes.crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(s"aggregate(sequence(0, ${M - 1}), CAST(0 AS DOUBLE), (acc, mm) -> acc + lut[mm * $K + codes[mm]])").as("adc"))
    pqAdcRerank(emb, adc)
  }

  def q159Sql: String = {
    val M = graft.functions.Hyperplanes.pqM
    val K = 1 << 8
    s"""WITH ${pqCteSql("embeddings", "embedding", 8)},
       adc AS (
         SELECT l.query_id, c.vec_id AS neighbor_id,
                list_reduce([l.lut[mm * $K + c.codes[mm + 1] + 1]
                             FOR mm IN generate_series(0, ${M - 1})], (acc, v) -> acc + v) AS adc
         FROM lut l CROSS JOIN codes c WHERE l.query_id <> c.vec_id),
       $pqTailSql"""
  }

  /** q160 — the hierarchical PQ8 encoder: q159's codebook and serving
    * with the ENCODE rebuilt on q150's two-level pattern, because q159's
    * sf10 leg measured the Θ(n·M·K) flat assignment as the knee at K=256
    * (25.6× — the q147 falsification arithmetic one layer down). Each
    * subspace's 256 cells are grouped by their seed high nibble; a
    * vector's subcode is found by ranking the 16 SUPER-centroids (exact
    * fixed-point sums of each group's member sums — same integer-mean
    * recipe, one more aggregation level) and then only the ≤16 cells of
    * the winning group: Θ(n·M·32), an 8× encode cut at identical
    * codebook, LUTs, ADC, and rerank. The greedy hierarchy can pick a
    * group whose best cell is globally second-best, so recall sits
    * between the 4-bit and flat-8-bit postures — measured at sf0.001:
    * 0.58, vs q159's flat-assign 0.73 and q154's 4-bit 0.47 (PqSpec pins
    * the ordering). On this near-uniform corpus the seed high-nibble
    * groups are weakly separated, so the greedy stage misroutes more
    * than clustered real corpora would; the dial is explicit — spend
    * Θ(n·M·K) when recall is the bar, Θ(n·M·2√K) when encode is.
    */
  def q160AnnPq8Hier(s: SparkSession, dir: String): DataFrame =
    pqHier8(s, dir, beam = 1)

  /** q161 — the beam dial on q160's hierarchical encoder: stage 1 keeps
    * the top-TWO super-groups per (vector, subspace) and stage 2 ranks
    * both groups' cells, Θ(n·M·48) vs q160's Θ(n·M·32) and q159's flat
    * Θ(n·M·256). The greedy hierarchy's miss mode is exactly a
    * second-best group holding the globally best cell, so one extra beam
    * recovers over half the gap — measured at sf0.001: recall 0.66 vs
    * q160's 0.58 and flat-8-bit q159's 0.73 (PqSpec pins the ordering).
    * The family is now a measured frontier: cells-scanned 32/48/256 →
    * recall 0.58/0.66/0.73 — at 100 TB the encode pass is the recurring
    * cost (every new document), so the beam, not K, is the production
    * recall dial.
    */
  def q161AnnPq8HierBeam(s: SparkSession, dir: String): DataFrame =
    pqHier8(s, dir, beam = 2)

  /** q165 — the PQ8 posture that closes the recall/encode gap (VERDICT
    * r9 item 5): 32 super-groups × 8 cells with ONE LLOYD ROUND on the
    * group structure, stage-1 beam 3. The q160/q161 recall ceiling
    * (beam-6 still 0.67 vs flat 0.73) was the seed grouping, not the
    * beam: cells grouped by their seed high bits are geometrically
    * arbitrary, so the stage-1 super-centroid ranking misroutes however
    * wide the beam. Reassigning each cell-centroid to its max-dot seed
    * super — a 256-row broadcast-scale step per subspace, independent of
    * corpus size — makes the groups coherent, and the measured frontier
    * (tools/PqFrontierProbe, sf0.001, 100 truth pairs) moves:
    * seed-grouped 48–80 cells plateau at 0.63–0.69; Lloyd-grouped 32×8
    * beam-3 reaches 0.71 at 56 cells/subspace — recall ≥ 0.7 held at
    * Θ(n·M·56) encode, 4.6× below flat q159's Θ(n·M·256) and free of its
    * measured 25.6× sf10 knee. This is the PQ8 family's registered 100×
    * posture: encode is the RECURRING per-document cost at 100 TB, so
    * the grouping refinement (paid once per codebook train) buys back
    * the hierarchical encoder's recall loss where it is cheap, not in
    * the per-vector hot loop.
    */
  def q165AnnPq8Lloyd(s: SparkSession, dir: String): DataFrame =
    pqHier8(s, dir, beam = 3, groupSize = 8, refine = true)

  /** DuckDB replica of q165 — the hierarchical CTEs at groupSize 8 plus
    * the Lloyd-round CTEs (groups1/supcent1 from exact re-aggregated
    * integer member sums), beam `rn <= 3`.
    */
  def q165Sql: String = pqHier8Sql(3, 8, refine = true)

  /** Shared core of q160/q161/q165: 8-bit PQ with two-level hierarchical
    * encode — `256 / groupSize` super-groups of `groupSize` cells each —
    * stage-1 beam width `beam`. Per-(vector, subspace) dot count is
    * `256/groupSize + beam * groupSize`, the whole encode-cost dial.
    * `private[graft]` so tools.PqFrontierProbe can sweep the
    * (beam, split) plane without registering every point as a query.
    */
  /** Train the hierarchical PQ model on a corpus: the pqBits codebook
    * (exact fixed-point means), a grouping of its cells into
    * `2^pqBits / groupSize` super-groups, and the groups' super-centroids
    * (member integer sums re-aggregated — exact adds, so bit-identical in
    * DuckDB under any grouping order). Returns (cents, groups, supCents):
    * (m, cell, centroid) / (m, cell, g) / (m, g, scentroid).
    *
    * Grouping: seed = the cell's high bits (cell div groupSize) — free,
    * but geometrically arbitrary, so stage 1 misroutes on
    * weakly-clustered corpora (the q160/q161 recall ceiling). Refined
    * (q165): one Lloyd round ON THE GROUP STRUCTURE — each cell-centroid
    * reassigned to its max-dot seed super-centroid (tie → lowest g),
    * supers then recomputed from their members. A 2^pqBits-row
    * broadcast-scale computation per subspace, independent of corpus
    * size; empty groups vanish from the recomputed relation so stage 1
    * never routes to a memberless group.
    */
  private[graft] def pqHierModelOn(emb: DataFrame, pqBits: Int,
                                   groupSize: Int, refine: Boolean,
                                   pinSums: Boolean = false)
      : (DataFrame, DataFrame, DataFrame) = {
    val H = graft.functions.Hyperplanes
    val subs = pqSubsOf(emb)
    val seeded = subs.withColumn("cell0", expr(H.sparkSubCellExpr("sub", "m", pqBits)))
    // NOT pinned by default (r13 measured): sums feeds cents once and
    // supCentsOf once or (refined) twice, but in the QUERY encode paths
    // every consumer sits under a BroadcastExchange, and those broadcast
    // jobs evaluate their towers CONCURRENTLY on otherwise-idle cores —
    // pinning serialized them behind one cache-materialization barrier
    // and cost q160/q161/q163/q165 a consistent +1-2 s each at sf0.1
    // (probes/r13opt). The INDEX WRITE path is different (r14): after
    // the tree write it re-executes the cents/groups/supcent towers as
    // three SEQUENTIAL model-relation writes, so there the bounded
    // (m, cell0, dim) aggregate — ≤ M·2^pqBits·subDim rows, model state,
    // not corpus data — is worth pinning (pinSums = true; measured in
    // probes/r14).
    val sums0 = seeded
      .select(col("m"), col("cell0"), posexplode(
        expr("transform(sub, x -> CAST(ROUND(x * 10000000) AS BIGINT))")).as(Seq("dim", "fx")))
      .groupBy(col("m"), col("cell0"), col("dim"))
      .agg(sum(col("fx")).as("sfx"), count(lit(1)).as("n"))
    val sums = if (pinSums) StorageHandle.sessionDefault().pin(sums0) else sums0
    val cents = sums.groupBy(col("m"), col("cell0"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, sfx, n))), e -> CAST(e.sfx AS DOUBLE) / e.n / 10000000)").as("centroid"))
      .select(col("m"), col("cell0").as("cell"), col("centroid"))
    def supCentsOf(groups: DataFrame): DataFrame = sums
      .join(groups.withColumnRenamed("cell", "cell0"), Seq("m", "cell0"))
      .groupBy(col("m"), col("g"), col("dim"))
      .agg(sum(col("sfx")).as("sfx"), sum(col("n")).as("n"))
      .groupBy(col("m"), col("g"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, sfx, n))), e -> CAST(e.sfx AS DOUBLE) / e.n / 10000000)").as("scentroid"))
    val seedGroups = cents.select(col("m"), col("cell"),
      expr(s"cell div $groupSize").as("g"))
    val groups =
      if (!refine) seedGroups
      else cents.join(broadcast(supCentsOf(seedGroups)), Seq("m"))
        .select(col("m"), col("cell"), col("g"),
          expr("graft_dot(centroid, scentroid)").as("sc"))
        .groupBy(col("m"), col("cell"))
        .agg(expr("max_by(g, struct(sc, -g))").as("g"))
    (cents, groups, supCentsOf(groups))
  }

  /** Hierarchical encode of `subs` against an explicit trained model —
    * stage 1 ranks the super-centroids and keeps the top `beam` groups
    * (sc desc, g asc — the ng negation keeps sort_array single-key);
    * stage 2 ranks only the kept groups' cells. Both aggregation passes
    * partial-aggregate; group cells are disjoint, so stage 2 never
    * scores a cell twice. Factored from the q160/q161/q165 query bodies
    * so the PQ index write/append path encodes with the SAME posture —
    * encode is the index's recurring cost, so the registered 100×
    * encoder and the index's encoder must be one code path.
    */
  /** One-row broadcast form of a trained hierarchical PQ model:
    * `sup_arr[m + 1]` = subspace m's super-centroid list
    * array<struct<g int, scent array<double>>>, and
    * `cells_arr[m + 1][g]` = group g's member cells
    * array<struct<cell int, cent array<double>>> (cell ascending).
    * Aggregations over ≤ M·2^pqBits rows — independent of corpus size.
    * The (m, gcells) assembly sorts with an explicit comparator because
    * structs containing MAP fields are not orderable.
    */
  private[graft] def pqHierModelRow(cents: DataFrame, groups: DataFrame,
                                    supCents: DataFrame): DataFrame = {
    // g arrives as BIGINT (`cell div groupSize`); the expression reads
    // int keys — a lossless cast (g < 2^pqBits).
    val supA = supCents.groupBy(col("m"))
      .agg(expr("collect_list(named_struct('g', CAST(g AS INT), 'scent', scentroid))").as("sups"))
    val cellA = cents.join(groups, Seq("m", "cell"))
      .groupBy(col("m"), col("g"))
      .agg(expr("transform(array_sort(collect_list(struct(cell, centroid))), e -> named_struct('cell', e.cell, 'cent', e.centroid))").as("cands"))
      .groupBy(col("m"))
      .agg(expr("map_from_entries(collect_list(struct(CAST(g AS INT) AS g, cands)))").as("gcells"))
    supA.join(cellA, Seq("m"))
      .agg(
        expr("transform(array_sort(collect_list(struct(m, sups))), e -> e.sups)").as("sup_arr"),
        expr("""transform(array_sort(collect_list(struct(m, gcells)),
            (l, r) -> CASE WHEN l.m < r.m THEN -1 WHEN l.m > r.m THEN 1 ELSE 0 END),
          e -> e.gcells)""").as("cells_arr"))
  }

  /** Hierarchical encode of a (vec_id, emb) frame against an explicit
    * trained model — stage 1 keeps the top-`beam` groups (sc DESC, g
    * ASC), stage 2 the argmax-dot cell among their members (ties →
    * lowest cell). r13: ONE map-only projection per corpus row — M
    * `graft_pq_hier_code` evals (hand-evaluated two-stage fold, see
    * [[graft.functions.PqHierCodeExpr]] for the ordering-parity
    * argument) against the one-row broadcast model, replacing the
    * (vector, subspace) explode, the stage-1 ObjectHashAggregate +
    * exchange, the stage-2 join + corpus-scale SortAggregate pair, and
    * the codes-reassembly aggregation — five corpus-scale operators and
    * their exchanges (guide §2.4; PqSpec/AnnIngestSpec pin codes
    * equality). Still factored from the q160/q161/q165 query bodies so
    * the PQ index write/append path encodes with the SAME posture —
    * encode is the index's recurring cost, so the registered 100×
    * encoder and the index's encoder must be one code path.
    */
  private[graft] def pqEncodeHier(vecs: DataFrame, cents: DataFrame,
                                  groups: DataFrame, supCents: DataFrame,
                                  beam: Int): DataFrame =
    vecs.crossJoin(broadcast(pqHierModelRow(cents, groups, supCents)))
      .select(col("vec_id"), expr(pqEncodeHierExprStr(beam)).as("codes"))

  /** The hierarchical-encode codes expression over a frame carrying
    * `emb` and [[pqHierModelRow]]'s `sup_arr`/`cells_arr` — exposed so
    * the index write computes codes in the SAME projection as its
    * bucket explode instead of joining a second encode pass by vec_id.
    */
  private[graft] def pqEncodeHierExprStr(beam: Int): String = {
    val H = graft.functions.Hyperplanes
    s"""transform(sequence(0, ${H.pqM - 1}), mm ->
       graft_pq_hier_code(slice(emb, mm * ${H.pqSubDim} + 1, ${H.pqSubDim}),
                          element_at(sup_arr, mm + 1),
                          element_at(cells_arr, mm + 1), $beam))"""
  }

  private[graft] def pqHier8(s: SparkSession, dir: String, beam: Int,
                             groupSize: Int = 16,
                             refine: Boolean = false): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val bits = 8
    val K = 1 << bits
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val (cents, groups, supCents) = pqHierModelOn(emb, bits, groupSize, refine)
    val hCodes = pqEncodeHier(emb, cents, groups, supCents, beam)
    val lut = pqLutDf(emb, cents, pqBits = bits)
    val adc = hCodes.crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        expr(s"aggregate(sequence(0, ${M - 1}), CAST(0 AS DOUBLE), (acc, mm) -> acc + lut[mm * $K + codes[mm]])").as("adc"))
    pqAdcRerank(emb, adc)
  }

  /** DuckDB replica of q160: the 8-bit train/LUT CTEs (the global-argmax
    * `scored`/`assigned`/`codes` CTEs in the shared prefix go unreferenced
    * and unexecuted), plus the two-stage hierarchical assignment —
    * super-centroids from re-aggregated integer member sums, ROW_NUMBER
    * tie-breaks mirroring the max_by struct ordering.
    */
  def q160Sql: String = pqHier8Sql(1)

  /** DuckDB replica of q161 — q160's hierarchical CTEs with the stage-1
    * beam widened to 2 (`rn <= 2`); stage 2's ROW_NUMBER already ranks
    * across whatever groups stage 1 kept.
    */
  def q161Sql: String = pqHier8Sql(2)

  /** The hierarchical-encode CTE block, shared by q160/q161/q165's
    * oracles and the PQ index oracles (q163/q164, which encode with the
    * q165 posture since the encoder switch): consumes the pqCteSql
    * prefix's `subs`/`sums`/`cent` relations and ends at `hcodes`
    * (vec_id, codes). Seed grouping (cell high bits) always trains
    * supcent0; the refined variant adds one Lloyd round — each
    * cell-centroid reassigned to its max-dot seed super (ties → lowest
    * g, the max_by struct order), then supers recomputed from member
    * integer sums. Final relation names are picked per dial so s1/h2
    * read one grouping only.
    */
  private def pqHierCodesCtes(beam: Int, groupSize: Int,
                              refine: Boolean): String = {
    val sd = graft.functions.Hyperplanes.pqSubDim
    val grpRel = if (refine) "groups1" else "groups0"
    val supRel = if (refine) "supcent1" else "supcent0"
    val refineCtes = if (!refine) "" else s"""
       groups1 AS (
         SELECT m, cell, g FROM (
           SELECT c.m, c.cell, sc.g,
                  ROW_NUMBER() OVER (PARTITION BY c.m, c.cell ORDER BY
                    list_reduce([c.centroid[i] * sc.scentroid[i]
                                 FOR i IN generate_series(1, $sd)], (acc, v) -> acc + v) DESC,
                    sc.g ASC) AS rn
           FROM cent c JOIN supcent0 sc ON c.m = sc.m) WHERE rn = 1),
       supsums1 AS (SELECT s.m, g.g, s.dim, SUM(s.sfx) AS sfx, SUM(s.n) AS n
                    FROM sums s JOIN groups1 g ON s.m = g.m AND s.cell0 = g.cell
                    GROUP BY 1, 2, 3),
       supcent1 AS (SELECT m, g, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS scentroid
                    FROM supsums1 GROUP BY m, g),"""
    s"""groups0 AS (SELECT m, cell, cell // $groupSize AS g FROM cent),
       supsums0 AS (SELECT s.m, g.g, s.dim, SUM(s.sfx) AS sfx, SUM(s.n) AS n
                    FROM sums s JOIN groups0 g ON s.m = g.m AND s.cell0 = g.cell
                    GROUP BY 1, 2, 3),
       supcent0 AS (SELECT m, g, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS scentroid
                    FROM supsums0 GROUP BY m, g),$refineCtes
       s1 AS (
         SELECT vec_id, m, g FROM (
           SELECT s.vec_id, s.m, c.g,
                  ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                    list_reduce([CAST(s.sub[i] AS DOUBLE) * c.scentroid[i]
                                 FOR i IN generate_series(1, $sd)], (acc, v) -> acc + v) DESC,
                    c.g ASC) AS rn
           FROM subs s JOIN $supRel c ON s.m = c.m) WHERE rn <= $beam),
       h2 AS (
         SELECT vec_id, m, cell AS code FROM (
           SELECT s.vec_id, s.m, c.cell,
                  ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
                    list_reduce([CAST(s.sub[i] AS DOUBLE) * c.centroid[i]
                                 FOR i IN generate_series(1, $sd)], (acc, v) -> acc + v) DESC,
                    c.cell ASC) AS rn
           FROM subs s JOIN s1 USING (vec_id, m)
                JOIN $grpRel gr ON gr.g = s1.g
                JOIN cent c ON c.m = s.m AND c.m = gr.m AND c.cell = gr.cell) WHERE rn = 1),
       hcodes AS (SELECT vec_id, list(code ORDER BY m) AS codes FROM h2 GROUP BY vec_id)"""
  }

  private def pqHier8Sql(beam: Int, groupSize: Int = 16,
                         refine: Boolean = false): String = {
    val M = graft.functions.Hyperplanes.pqM
    val K = 1 << 8
    s"""WITH ${pqCteSql("embeddings", "embedding", 8)},
       ${pqHierCodesCtes(beam, groupSize, refine)},
       adc AS (
         SELECT l.query_id, c.vec_id AS neighbor_id,
                list_reduce([l.lut[mm * $K + c.codes[mm + 1] + 1]
                             FOR mm IN generate_series(0, ${M - 1})], (acc, v) -> acc + v) AS adc
         FROM lut l CROSS JOIN hcodes c WHERE l.query_id <> c.vec_id),
       $pqTailSql"""
  }

  /** DuckDB replica of q156: the q155 IVF CTEs plus a residual relation
    * (embedding − assigned-cell centroid, exact IEEE subtraction on the
    * shared fixed-point centroids), the PQ CTEs retargeted at the
    * residuals, a per-(probe, cell) query·centroid dot, and the
    * decomposed ADC qc + LUT-fold.
    */
  def q156Sql: String = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val K = 1 << H.pqBits
    val ivfCell0 = H.duckCellSqlN("embedding", 4)
    s"""WITH ivf_seeded AS (SELECT vec_id, embedding, $ivfCell0 AS cell0 FROM embeddings),
       ivf_comps AS (SELECT cell0, i - 1 AS dim,
                            CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 10000000) AS BIGINT) AS fx
                     FROM ivf_seeded, UNNEST(generate_series(1, len(embedding))) AS t(i)),
       ivf_sums AS (SELECT cell0, dim, SUM(fx) AS sfx, COUNT(*) AS n FROM ivf_comps GROUP BY 1, 2),
       ivf_cent AS (SELECT cell0 AS cell, list(CAST(sfx AS DOUBLE) / n / 10000000 ORDER BY dim) AS centroid
                    FROM ivf_sums GROUP BY cell0),
       ivf_ranked AS (
         SELECT e.vec_id, c.cell,
                ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                  list_reduce([CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]
                               FOR i IN generate_series(1, len(e.embedding))],
                              (acc, v) -> acc + v) DESC, c.cell ASC) AS rn
         FROM embeddings e CROSS JOIN ivf_cent c),
       ivf_assigned AS (SELECT vec_id, cell FROM ivf_ranked WHERE rn = 1),
       probecells AS (SELECT vec_id AS query_id, cell FROM ivf_ranked WHERE rn <= 4 AND vec_id < 20),
       resid AS (
         SELECT e.vec_id,
                [CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]
                 FOR i IN generate_series(1, len(e.embedding))] AS rvec
         FROM embeddings e JOIN ivf_assigned a ON e.vec_id = a.vec_id
              JOIN ivf_cent c ON a.cell = c.cell),
       ${pqCteSql("resid", "rvec")},
       qc AS (
         SELECT e.vec_id AS query_id, c.cell,
                list_reduce([CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]
                             FOR i IN generate_series(1, len(e.embedding))],
                            (acc, v) -> acc + v) AS qc
         FROM embeddings e CROSS JOIN ivf_cent c WHERE e.vec_id < 20),
       adc AS (
         SELECT p.query_id, c.vec_id AS neighbor_id,
                q.qc + list_reduce([l.lut[mm * $K + c.codes[mm + 1] + 1]
                                    FOR mm IN generate_series(0, ${M - 1})], (acc, v) -> acc + v) AS adc
         FROM probecells p
              JOIN ivf_assigned a USING (cell)
              JOIN codes c ON a.vec_id = c.vec_id
              JOIN qc q ON q.query_id = p.query_id AND q.cell = p.cell
              JOIN lut l ON l.query_id = p.query_id
         WHERE c.vec_id <> p.query_id),
       $pqTailSql"""
  }

  // ------------------------------------------------------------------
  // PQ-coded persisted ANN index (q163 build / q164 probe): the q140
  // index discipline with the hot rows shrunk from a 512-byte float
  // vector to an 8-byte PQ8 code.
  // ------------------------------------------------------------------

  /** q163/q164 index geometry: the same held-L 16×14 decade posture as
    * q140 (bucket side) + PQ8 codes (payload side). The payload move is
    * the point: q140's bucket rows carry the full 64-dim double vector
    * (512 B) so scoring never leaves the index; q163's rows carry the
    * 8-byte PQ8 code instead — 64× less hot index I/O — and scoring
    * happens in ADC space (8 LUT lookups + 7 adds per candidate) with
    * only the 32-deep per-query shortlist ever touching the cold float
    * store. At 100 TB of embeddings (~1.5e11 vectors), the q140 layout's
    * index is ~1.2 PB hot (16 tables × 512 B); this one is ~19 TB hot —
    * the difference between an index that must live on the data lake and
    * one that fits a serving tier's NVMe.
    */
  private[graft] val annPqGeometry: (Int, Int) = (14, 16)
  private[graft] val annPqBits = 8
  // The index's encoder is q165's registered 100× posture — 32×8
  // Lloyd-refined groups, beam 3 — NOT the flat argmax: encode is the
  // recurring per-document cost of index maintenance (every build and
  // every appended batch), exactly where q159's Θ(n·M·256) knee lives.
  private[graft] val annPqGroupSize = 8
  private[graft] val annPqBeam = 3

  /** Deterministic per-corpus PQ-index location (tmpdir-scoped, distinct
    * from [[annIndexPath]] so the two index families never collide).
    */
  def annPqIndexPath(dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_annpq_index_${Integer.toHexString(dir.hashCode)}"

  /** Write (or append to) a PQ-coded ANN index: LSH bucket rows exactly
    * like [[annIndexWrite]] — (tbl, bgrp) directory layer, sorted full
    * bucket column, `_geometry` record — but each row carries the
    * vector's PQ8 `codes` (M small ints, 8 B) instead of its floats.
    * The trained codebook is persisted next to the geometry under
    * `_codebook` (m, cell, centroid, pq_bits), because the codebook IS
    * part of the index: a probe must build its LUTs against the exact
    * centroids the resident codes were assigned to.
    *
    * Encode uses q165's registered 100× posture (32×8 Lloyd-refined
    * groups, beam 3 — Θ(n·M·56) vs the flat Θ(n·M·256) knee q159
    * measured at sf10), because encode is the index's RECURRING cost:
    * paid at build and again for every appended batch. The grouping and
    * super-centroids are part of the model, persisted as `_groups` /
    * `_supcent` beside `_codebook`.
    *
    * Appends follow the incremental discipline on ALL learned
    * structures: the batch is hashed with the recorded geometry (fail
    * fast on mismatch, as [[annIndexWrite]]) and encoded against the
    * PERSISTED codebook + grouping — never retrained, which would
    * silently shift every resident code's meaning. Codebook drift under
    * distribution shift is a rebuild decision, not an append side
    * effect.
    */
  def annPqIndexWrite(vecs: DataFrame, path: String,
                      mode: String = "overwrite",
                      bitsPerTable: Int = annPqGeometry._1,
                      numTables: Int = annPqGeometry._2,
                      pqBits: Int = annPqBits): Unit = {
    val s = vecs.sparkSession
    graft.functions.VectorExpressions.register(s)
    val cbPath = s"$path/_codebook"
    val cbExists = java.nio.file.Files.exists(java.nio.file.Paths.get(cbPath))
    if (mode == "append") {
      indexGeometry(s, path).foreach { existing =>
        require(existing == ((bitsPerTable, numTables)),
          s"append geometry ($numTables x $bitsPerTable) != index geometry $existing at $path")
      }
      if (cbExists) {
        val recorded = s.read.parquet(cbPath).select(max(col("pq_bits"))).head().getInt(0)
        require(recorded == pqBits,
          s"append pq_bits ($pqBits) != index codebook pq_bits ($recorded) at $path")
      }
    }
    // The grouping and super-centroids are PART of the model — an append
    // encoded against recomputed groups (whose Lloyd refinement would see
    // only the batch's distribution) could route a twin of a resident
    // vector to a different cell. Persist all three relations at train
    // time; reuse them verbatim on append.
    val (cents, groups, supCents) =
      if (mode == "append" && cbExists) (
        s.read.parquet(cbPath).select(col("m"), col("cell"), col("centroid")),
        s.read.parquet(s"$path/_groups"),
        s.read.parquet(s"$path/_supcent"))
      else pqHierModelOn(vecs, pqBits,
        groupSize = math.min(annPqGroupSize, 1 << pqBits), refine = true)
    val grpBits = indexGrpBits(bitsPerTable)
    // r13: codes are computed in the SAME projection as the bucket
    // explode (both are per-row functions of emb against the one-row
    // broadcast model) — the old shape ran a second encode subtree and
    // joined it back by vec_id, a corpus-scale exchange pair paid on
    // every build AND every appended batch (guide §2.4).
    vecs.crossJoin(broadcast(pqHierModelRow(cents, groups, supCents)))
      .select(col("vec_id"), expr(pqEncodeHierExprStr(annPqBeam)).as("codes"), posexplode(
        expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb", bitsPerTable, numTables)))
        .as(Seq("tbl", "bucket")))
      .select(col("vec_id"), col("codes"), col("tbl").cast("int").as("tbl"),
        col("bucket").cast("int").as("bucket"))
      .withColumn("bgrp", col("bucket").bitwiseAND(lit((1 << grpBits) - 1)))
      .repartition(col("tbl"), col("bgrp"))
      .sortWithinPartitions(col("tbl"), col("bgrp"), col("bucket"))
      .write.mode(mode).partitionBy("tbl", "bgrp").parquet(path)
    // r14 (guide §2.6, VERDICT r13 item 3): the geometry record and the
    // three model relations are mutually independent tiny writes — each a
    // fixed-latency Spark job (sequentially ~3.3 s of the build at sf0.1,
    // probes/r14/q163_tail_probe.log) — so submit them concurrently and
    // let the scheduler overlap their stages on otherwise-idle cores.
    // All of them still start only AFTER the bucket-tree write committed
    // (the static partitionBy overwrite clears the root first — the r8
    // ordering constraint), and the persisted layout is byte-identical
    // to the sequential form.
    val tailWrites = scala.collection.mutable.ArrayBuffer[() => Unit](
      () => s.range(1)
        .select(lit(bitsPerTable).as("bits"), lit(numTables).as("tables"))
        .write.mode("overwrite").parquet(s"$path/_geometry"))
    if (!(mode == "append" && cbExists)) {
      tailWrites += (() => cents.withColumn("pq_bits", lit(pqBits))
        .write.mode("overwrite").parquet(cbPath))
      tailWrites += (() => groups.write.mode("overwrite").parquet(s"$path/_groups"))
      tailWrites += (() => supCents.write.mode("overwrite").parquet(s"$path/_supcent"))
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tailWrites.size)
    try tailWrites.map(f => pool.submit(new java.util.concurrent.Callable[Unit] {
      override def call(): Unit = f()
    })).foreach(_.get())
    finally pool.shutdown()
    Similarity.synchronized { builtIndexPaths += path }
  }

  /** Probe a PQ-coded index with a new batch: hash ONLY the batch with
    * the recorded geometry, broadcast its bucket keys against the pruned
    * index scan (the [[annIndexProbe]] candidate discipline), then score
    * in ADC space — per-probe LUTs from the PERSISTED codebook, 8
    * lookups + 7 adds per candidate over the 8-byte resident codes — and
    * exact-rerank only the 32-deep shortlist against `coldVecs`, the
    * float store that deliberately does NOT live in the index.
    *
    * The LUT join is a plain key join, not a broadcast: each LUT row is
    * M·2^pqBits doubles (16 KiB at PQ8), so a broadcast scales with the
    * batch — fine nightly, wrong for the registered fixture where the
    * batch is 10% of the corpus. Candidates and LUTs are both keyed by
    * query_id, and the shortlist window that follows shuffles on
    * query_id anyway, so the join rides the same partitioning.
    *
    * Dedup happens BEFORE scoring here (inverted from
    * [[annIndexProbe]] — see the inline comment): ADC needs the LUT row
    * attached, so the distinct runs while the candidate tuple is still
    * just (query, neighbor, codes).
    */
  def annPqIndexProbe(s: SparkSession, indexPath: String,
                      newVecs: DataFrame, coldVecs: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val H = graft.functions.Hyperplanes
    val index = s.read.parquet(indexPath)
    val (bitsPerTable, numTables) = indexGeometry(s, indexPath).getOrElse(annPqGeometry)
    val cb = s.read.parquet(s"$indexPath/_codebook")
    val pqBits = cb.select(max(col("pq_bits"))).head().getInt(0)
    val cents = cb.select(col("m"), col("cell"), col("centroid"))
    val M = H.pqM
    val K = 1 << pqBits
    val probeSigs = newVecs
      .select(col("vec_id"), posexplode(
        expr(H.sparkBucketsExpr("emb", bitsPerTable, numTables)))
        .as(Seq("tbl", "bucket")))
      .select(col("vec_id"), col("tbl").cast("int").as("tbl"),
        col("bucket").cast("int").as("bucket"))
      .withColumn("bgrp", col("bucket")
        .bitwiseAND(lit((1 << indexGrpBits(bitsPerTable)) - 1)))
    // Dedup BEFORE the LUT join — the opposite order from
    // [[annIndexProbe]], and for the same materialization reason
    // inverted: there the score was cheap and the payload (the float
    // vector) already sat in the candidate row, so scoring first kept
    // the dedup tuples at 24 bytes; here scoring needs the 16 KiB LUT
    // row attached, so a pair surfacing in k ≤ 16 tables would
    // materialize k copies of its query's LUT through the join buffer.
    // Distinct first shrinks that to one (the candidate tuple is
    // query + neighbor + the 8-byte codes — still narrow).
    val cands = broadcast(probeSigs.as("q"))
      .join(index.as("n"),
        col("q.tbl") === col("n.tbl") && col("q.bgrp") === col("n.bgrp") &&
          col("q.bucket") === col("n.bucket") &&
          col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"),
        col("n.codes").as("codes"))
      .distinct()
    val lut = pqLutDf(newVecs, cents, pqBits, queryFilter = lit(true))
    val adc = cands.join(lut, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr(s"aggregate(sequence(0, ${M - 1}), CAST(0 AS DOUBLE), (acc, mm) -> acc + lut[mm * $K + codes[mm]])").as("adc"))
    pqAdcRerankOn(newVecs, coldVecs, adc)
  }

  // ------------------------------------------------------------------
  // Geometry-step migration (VERDICT r11 item 1): the per-decade doctrine
  // proved b must step with log₂(corpus) — measured at three decades —
  // but both persisted index families pinned (bits, tables) at build time
  // with fail-fast appends, so a corpus that grew a decade had no path
  // except a full rebuild. A rebucket is that path: only the DERIVED
  // bucket/bgrp columns depend on the geometry — the PQ codes, the
  // codebook/grouping model, and (in the float family) the vectors are
  // all geometry-independent — so migration is hash + rewrite of the
  // index tree: no re-encode (the Θ(n·M·56) beamed encode that dominates
  // a rebuild), no codebook retrain (which would silently shift every
  // resident code's meaning), no model I/O beyond a verbatim copy.
  // ------------------------------------------------------------------

  /** One resident row per vector from a bucket-exploded index tree: the
    * writer explodes every vector into ALL `numTables` tables (appends
    * too), so table 0 alone holds the full resident set — reading it is a
    * partition-pruned 1/numTables scan. `distinct` compacts the
    * result-neutral crash-window duplicates ([[graft.streaming.AnnIngest]]
    * appends between "files landed" and "marker written") — a rebucket is
    * the natural compaction point for them.
    */
  private def indexResidents(s: SparkSession, path: String,
                             payload: String): DataFrame =
    s.read.parquet(path).filter(col("tbl") === 0)
      .select(col("vec_id"), col(payload)).distinct()

  /** Re-derive the bucket tree for `rows` (vec_id, emb, payloadCols…) at a
    * new geometry and ATOMICALLY swap it in: signatures hash off `emb`,
    * the written rows keep (vec_id, payloadCols…, tbl, bucket, bgrp) — the
    * exact schema the family's writer lays down. The new tree is fully
    * written — bucket rows, `_geometry`, every `extraRels` relation copied
    * verbatim, `_ingest` replay markers — under `path.__rebucket` BEFORE
    * the two directory renames that publish it, so a failure at any
    * earlier point leaves the index serving the old geometry untouched.
    * Locally the swap is two same-filesystem renames; on an object store
    * the same discipline is a manifest/pointer update — either way the
    * serving window is the swap, not the rewrite, which is what makes the
    * migration an online maintenance op instead of a serving outage.
    */
  private def rebucketSwap(s: SparkSession, path: String, rows: DataFrame,
                           payloadCols: Seq[String], newBits: Int,
                           newTables: Int, extraRels: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths}
    val tmp = s"$path.__rebucket"
    val old = s"$path.__old"
    // A retried migration must never destroy the crash-window copy
    // (VERDICT r12 item 1): if a previous swap died between its two
    // publish renames, the index exists ONLY at `old` — restore it
    // before any cleanup. `old` is deleted nowhere before the new tree
    // below has been fully written (which reads `path` end to end).
    recoverInterruptedSwap(path)
    deleteTree(tmp)
    val grpBits = indexGrpBits(newBits)
    val keep = col("vec_id") +: payloadCols.map(col)
    rows
      .select(keep :+ posexplode(
        expr(graft.functions.Hyperplanes.sparkBucketsExpr("emb", newBits, newTables)))
        .as(Seq("tbl", "bucket")): _*)
      .select(keep :+ col("tbl").cast("int").as("tbl")
        :+ col("bucket").cast("int").as("bucket"): _*)
      .withColumn("bgrp", col("bucket").bitwiseAND(lit((1 << grpBits) - 1)))
      .repartition(col("tbl"), col("bgrp"))
      .sortWithinPartitions(col("tbl"), col("bgrp"), col("bucket"))
      .write.mode("overwrite").partitionBy("tbl", "bgrp").parquet(tmp)
    s.range(1)
      .select(lit(newBits).as("bits"), lit(newTables).as("tables"))
      .write.mode("overwrite").parquet(s"$tmp/_geometry")
    extraRels.foreach { rel =>
      if (Files.exists(Paths.get(s"$path/$rel")))
        s.read.parquet(s"$path/$rel").write.mode("overwrite").parquet(s"$tmp/$rel")
    }
    // Replay state travels with the index (the AnnIngest commit markers):
    // every already-committed batch's rows ARE in the rebucketed tree, so
    // dropping the markers would make a resumed stream re-append them.
    val ingest = Paths.get(path, "_ingest")
    if (Files.exists(ingest)) {
      Files.createDirectories(Paths.get(tmp, "_ingest"))
      import scala.jdk.CollectionConverters._
      Files.list(ingest).iterator().asScala.foreach { m =>
        Files.copy(m, Paths.get(tmp, "_ingest", m.getFileName.toString))
      }
    }
    // Only now can a leftover `old` be stale (a crash AFTER a previous
    // publish, before its cleanup): `path` exists and the tmp write
    // above read it successfully, so the leftover is superseded.
    deleteTree(old)
    Files.move(Paths.get(path), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(path))
    deleteTree(old)
    // Spark's shared FileStatusCache may hold the pre-swap listing.
    s.catalog.refreshByPath(path)
  }

  /** Recover a crashed swap publish (VERDICT r12 item 1 / ADVICE r12):
    * [[rebucketSwap]] publishes via two renames — `path` → `path.__old`,
    * then `path.__rebucket` → `path` — so a crash between them leaves the
    * ONLY copy of the index at `path.__old`. Before this fix, a retried
    * migration deleted that copy unconditionally, and an auto-step ingest
    * restart silently bootstrapped a fresh near-empty index at `path`
    * (geometry falls back to the boot parameters when `_geometry` is
    * unreadable) — unrecoverable data loss either way. Every swap,
    * migration/compaction entry point, and ingest append now calls this
    * first: if `path` is missing but `path.__old` exists, the crashed
    * publish is rolled BACK by renaming the surviving copy into place.
    * Roll-back, not roll-forward: a leftover `__rebucket` tree is cheap
    * to regenerate (the rewrite is idempotent), while adjudicating its
    * completeness is not. Returns true when a recovery happened.
    * Concurrent callers race benignly — the loser's rename fails with
    * the index already restored.
    */
  def recoverInterruptedSwap(path: String): Boolean = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(path)
    val old = Paths.get(s"$path.__old")
    if (!Files.exists(p) && Files.exists(old)) {
      try { Files.move(old, p); true }
      catch { case e: Exception =>
        if (Files.exists(p)) false // another caller won the restore race
        else throw e
      }
    } else false
  }

  /** Depth-first tree delete with the walk stream CLOSED (ADVICE r12:
    * `Files.walk` returns a Stream holding a directory handle per level —
    * leaking one per call). Shared by the swap paths, the JVM-exit index
    * cleanup, and the probe tools' fixture preambles.
    */
  private[graft] def deleteTree(p: String): Unit = {
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally walk.close()
    }
  }

  /** Migrate a PQ-coded index ([[annPqIndexWrite]]) to a new bucket
    * geometry WITHOUT re-encoding or retraining — the operable form of
    * the b-per-decade doctrine for a live index. The 8-byte PQ codes are
    * geometry-independent, so the migration reads ONE table's resident
    * (vec_id, codes) rows (a partition-pruned 1/numTables scan), joins
    * the float store to re-derive signatures (the codes are lossy — the
    * index deliberately does not carry floats, so `coldVecs` is the same
    * companion relation every probe already needs), hashes at the new
    * geometry, and rewrites the tree; the codebook/grouping model is
    * copied verbatim and the `_ingest` replay markers travel. A resident
    * missing from `coldVecs` fails the migration loudly (raise_error in
    * the join projection) — silently dropping it would un-index a
    * serveable vector.
    *
    * Cost vs the rebuild it replaces (measured at two decades in
    * BASELINE.md; probes/r12): hash + shuffle + write only — it skips
    * codebook training and the Θ(n·M·56) beamed encode that dominate
    * [[annPqIndexWrite]], and the sort/shuffle rows are 8-byte codes, not
    * 512-byte vectors. Appends against the OLD geometry fail fast
    * afterwards, exactly as the recorded-geometry discipline requires.
    */
  def annPqIndexRebucket(s: SparkSession, path: String, coldVecs: DataFrame,
                         newBits: Int, newTables: Int = -1): Unit = {
    recoverInterruptedSwap(path)
    val (oldBits, oldTables) = indexGeometry(s, path).getOrElse(
      throw new IllegalArgumentException(
        s"no _geometry record at $path — cannot rebucket an unrecorded index"))
    val nt = if (newTables == -1) oldTables else newTables
    if ((newBits, nt) == ((oldBits, oldTables))) return
    pqRewriteTree(s, path, coldVecs, newBits, nt)
  }

  /** One-pass rewrite of a PQ index's bucket tree: resident scan +
    * float-store join (raise_error on a resident the store lacks) +
    * hash at `bits`/`tables` + atomic swap. [[annPqIndexRebucket]] calls
    * it at a NEW geometry; [[annPqIndexCompact]] at the CURRENT one.
    */
  private def pqRewriteTree(s: SparkSession, path: String, coldVecs: DataFrame,
                            bits: Int, tables: Int): Unit = {
    graft.functions.VectorExpressions.register(s)
    val residents = indexResidents(s, path, "codes")
    val rows = residents
      .join(coldVecs.select(col("vec_id"), col("emb")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("codes"),
        expr("CASE WHEN emb IS NOT NULL THEN emb ELSE raise_error(concat(" +
          "'annPqIndexRebucket: resident vec_id ', CAST(vec_id AS STRING), " +
          "' has no row in coldVecs — the float store must cover every resident')) END")
          .as("emb"))
    rebucketSwap(s, path, rows, payloadCols = Seq("codes"), bits, tables,
      extraRels = Seq("_codebook", "_groups", "_supcent"))
    // Deliberately NOT registered in builtIndexPaths: a rewrite must not
    // change the index's durability class. An index CREATED by this JVM
    // is already registered by its writer; migrating/compacting a
    // persisted index another process built must not mark it for
    // JVM-exit deletion.
  }

  /** Compact a PQ index WITHOUT changing its geometry: the same one-pass
    * tree rewrite as [[annPqIndexRebucket]], at the recorded (bits,
    * tables). What it buys, measured (probes/r12/autostep_sf10.log +
    * compact_sf10.log): every streamed append drops ~256 small files
    * into the partition tree, and at a post-step geometry where
    * shortlist candidates are cheap, FILE LISTING is what's left of
    * probe-latency growth — the auto-step run's post-migration probe
    * (on a freshly swapped, compact tree) was its floor for exactly
    * this reason. Compaction also reclaims the result-neutral
    * crash-window duplicate rows (`distinct` in the resident scan) the
    * AnnIngest scaladoc promises ordinary compaction will collect.
    * Same atomicity as the migration: the new tree is fully written
    * before the swap; a pre-swap failure leaves the old tree serving.
    */
  def annPqIndexCompact(s: SparkSession, path: String, coldVecs: DataFrame): Unit = {
    recoverInterruptedSwap(path)
    val (bits, tables) = indexGeometry(s, path).getOrElse(
      throw new IllegalArgumentException(
        s"no _geometry record at $path — cannot compact an unrecorded index"))
    pqRewriteTree(s, path, coldVecs, bits, tables)
  }

  /** [[annPqIndexCompact]] for the float-vector family — self-contained
    * like [[annIndexRebucket]] (the rows carry the vectors).
    */
  def annIndexCompact(s: SparkSession, path: String): Unit = {
    graft.functions.VectorExpressions.register(s)
    recoverInterruptedSwap(path)
    val (bits, tables) = indexGeometry(s, path).getOrElse(
      throw new IllegalArgumentException(
        s"no _geometry record at $path — cannot compact an unrecorded index"))
    rebucketSwap(s, path, indexResidents(s, path, "emb"),
      payloadCols = Seq("emb"), bits, tables, extraRels = Seq.empty)
    // Not registered in builtIndexPaths — see pqRewriteTree.
  }

  /** [[annPqIndexRebucket]] for the float-vector family
    * ([[annIndexWrite]]): the bucket rows carry the vector itself, so the
    * migration is fully self-contained — one pruned table scan, hash at
    * the new geometry, rewrite, swap. No external relation at all.
    */
  def annIndexRebucket(s: SparkSession, path: String,
                       newBits: Int, newTables: Int = -1): Unit = {
    graft.functions.VectorExpressions.register(s)
    recoverInterruptedSwap(path)
    val (oldBits, oldTables) = indexGeometry(s, path).getOrElse(
      throw new IllegalArgumentException(
        s"no _geometry record at $path — cannot rebucket an unrecorded index"))
    val nt = if (newTables == -1) oldTables else newTables
    if ((newBits, nt) == ((oldBits, oldTables))) return
    rebucketSwap(s, path, indexResidents(s, path, "emb"),
      payloadCols = Seq("emb"), newBits, nt, extraRels = Seq.empty)
    // Not registered in builtIndexPaths — see pqRewriteTree.
  }

  /** Mean PQ quantization-residual energy of a (vec_id, emb) frame under
    * an index's PERSISTED model: encode ≤ `sampleN` of its rows exactly
    * as an append would ([[pqEncodeHier]] against the persisted
    * codebook/grouping, beam [[annPqBeam]]) and average ‖sub − c‖² over
    * every (vector, subspace) pair, c the assigned centroid. This is the
    * live codebook-drift proxy (VERDICT r12 item 3,
    * [[graft.streaming.PqDriftMonitor]]): a batch the codebook models
    * well scores ≈ the bootstrap residents' energy, while a
    * mean-shift-class batch — the shift class [[graft.tools.PqDriftProbe]]
    * measured crossing the 0.05 recall@5 rebuild floor at ~60% shifted
    * corpus — scores measurably higher the moment it ARRIVES, and
    * permutation-class drift (measured harmless: gap ≤ 0.03 through 67%
    * shifted corpus) does not move it. Cost: one broadcast-codebook
    * encode over a bounded sample — O(sampleN·M·beam·groupSize) dots,
    * no shuffle beyond the per-vector aggregation, independent of both
    * batch and index size.
    */
  def pqResidualEnergy(s: SparkSession, batch: DataFrame, indexPath: String,
                       sampleN: Int = 1024): Double = {
    graft.functions.VectorExpressions.register(s)
    val cents = s.read.parquet(s"$indexPath/_codebook")
      .select(col("m"), col("cell"), col("centroid"))
    val groups = s.read.parquet(s"$indexPath/_groups")
    val supCents = s.read.parquet(s"$indexPath/_supcent")
    val sample = batch.select(col("vec_id"), col("emb")).limit(sampleN)
    val subs = pqSubsOf(sample)
    val codes = pqEncodeHier(sample, cents, groups, supCents, annPqBeam)
    subs.join(codes, Seq("vec_id"))
      .select(col("vec_id"), col("m"), col("sub"),
        expr("element_at(codes, m + 1)").as("cell"))
      .join(broadcast(cents), Seq("m", "cell"))
      .select(expr("aggregate(zip_with(sub, centroid, (a, b) -> (a - b) * (a - b)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)").as("r2"))
      .agg(avg(col("r2"))).head().getDouble(0)
  }

  /** The batch side of the occupancy-divergence drift proxy
    * ([[graft.streaming.PqDriftMonitor]]): per-subspace code-occupancy
    * counts of ≤ `sampleN` of `batch`'s rows, encoded exactly as an
    * append would encode them ([[pqEncodeHier]] against the persisted
    * model, beam [[annPqBeam]]). Cost: one broadcast-model encode over a
    * bounded sample — no index I/O beyond the few-KB model relations,
    * no shuffle beyond the tiny (m, code) count; the returned map is ≤
    * M·2^pqBits entries.
    */
  def pqBatchCodeCounts(s: SparkSession, batch: DataFrame, indexPath: String,
                        sampleN: Int = 1024): Map[(Int, Int), Long] = {
    graft.functions.VectorExpressions.register(s)
    val cents = s.read.parquet(s"$indexPath/_codebook")
      .select(col("m"), col("cell"), col("centroid"))
    val groups = s.read.parquet(s"$indexPath/_groups")
    val supCents = s.read.parquet(s"$indexPath/_supcent")
    pqEncodeHier(batch.select(col("vec_id"), col("emb")).limit(sampleN),
        cents, groups, supCents, annPqBeam)
      .select(posexplode(col("codes")).as(Seq("m", "code")))
      .groupBy(col("m"), col("code")).count().collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
  }

  /** The reference side of the occupancy-divergence drift proxy: the
    * RESIDENTS' per-subspace code occupancy, read straight from the
    * codes the index already stores — one partition-pruned one-table
    * scan over ≤ `sampleN` rows, no float store, no re-encode.
    */
  def pqResidentCodeCounts(s: SparkSession, indexPath: String,
                           sampleN: Int = 1024): Map[(Int, Int), Long] =
    s.read.parquet(indexPath).filter(col("tbl") === 0)
      .select(col("vec_id"), col("codes")).distinct().limit(sampleN)
      .select(posexplode(col("codes")).as(Seq("m", "code")))
      .groupBy(col("m"), col("code")).count().collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap

  /** pq_bits recorded in a PQ index's codebook — 2^pq_bits is the
    * per-subspace cell count the divergence grid runs over.
    */
  def pqIndexBits(s: SparkSession, indexPath: String): Int =
    s.read.parquet(s"$indexPath/_codebook")
      .select(max(col("pq_bits"))).head().getInt(0)

  /** Build the q163/q164 fixture index lazily once per SF dir — the
    * [[ensureQ140Index]] reuse/staleness discipline, plus the codebook
    * in the completeness check (an index with codes but no `_codebook`
    * cannot be probed).
    */
  private def ensureQ163Index(s: SparkSession, dir: String): String = {
    val path = annPqIndexPath(dir)
    val done = java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")) &&
      (try {
        val fields = s.read.parquet(path).schema.fieldNames
        fields.contains("codes") && fields.contains("bgrp")
      } catch { case _: Throwable => false }) &&
      indexGeometry(s, path).contains(annPqGeometry) &&
      // Hier-encoder indexes persist their grouping; a tree without
      // _groups/_supcent predates the q165 encoder switch and its codes
      // were flat-assigned — rebuild rather than serve mixed encodings.
      java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_groups")) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_supcent")) &&
      (try {
        s.read.parquet(s"$path/_codebook").select(max(col("pq_bits"))).head().getInt(0) == annPqBits
      } catch { case _: Throwable => false })
    if (!done) {
      val corpus = t(s, dir, "embeddings")
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
        .filter(col("vec_id") % 10 =!= 0)
      annPqIndexWrite(corpus, path)
    } else Similarity.synchronized { builtIndexPaths += path }
    path
  }

  /** The MAINTENANCE side of q164 (the q144 pattern, audit-marked in
    * `SparkEntry.auditBaselines`): rebuild the PQ-coded corpus index from
    * scratch — codebook training + q165-posture hierarchical encode +
    * 16-table bucket write — and
    * return per-table occupancy PLUS a codes checksum (Σ over rows of
    * Σ_m codes[m]·(m+1)), so the oracle structurally pins not just the
    * bucket layout but the resident CODES: DuckDB retrains the codebook
    * and re-encodes every vector from the shared seed planes and must
    * agree on the folded sum per table.
    */
  def q163AnnPqIndexBuild(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val corpus = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .filter(col("vec_id") % 10 =!= 0)
    val path = annPqIndexPath(dir)
    annPqIndexWrite(corpus, path)
    s.read.parquet(path)
      .groupBy(col("tbl"))
      .agg(countDistinct(col("bucket")).as("n_buckets"), count(lit(1)).as("n_rows"),
        sum(expr(s"aggregate(sequence(0, ${graft.functions.Hyperplanes.pqM - 1}), CAST(0 AS BIGINT), (acc, mm) -> acc + codes[mm] * (mm + 1))")).as("code_sum"))
      .orderBy(col("tbl"))
  }

  def q163Sql: String = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val sig = H.duckBucketsSql("embedding", annPqGeometry._1, annPqGeometry._2)
    val nt = annPqGeometry._2
    s"""WITH corp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
       ${pqCteSql("corp", "embedding", annPqBits, "q.vec_id % 10 = 0")},
       ${pqHierCodesCtes(annPqBeam, annPqGroupSize, refine = true)},
       csum AS (SELECT CAST(SUM(list_reduce([codes[mm + 1] * (mm + 1)
                         FOR mm IN generate_series(0, ${M - 1})], (acc, v) -> acc + v)) AS BIGINT) AS code_sum
                FROM hcodes),
       sig AS (SELECT vec_id, $sig AS sig FROM embeddings WHERE vec_id % 10 <> 0)
       SELECT CAST(t.i - 1 AS INT) AS tbl,
              COUNT(DISTINCT sig[t.i]) AS n_buckets,
              COUNT(*) AS n_rows,
              (SELECT code_sum FROM csum) AS code_sum
       FROM sig, generate_series(1, $nt) AS t(i)
       GROUP BY 1 ORDER BY 1"""
  }

  /** Registered end-to-end posture: probe the persisted PQ-coded corpus
    * index (vec_id % 10 != 0) with the new batch (vec_id % 10 == 0) —
    * the q140 fixture convention, so the two index families' probes are
    * directly comparable. The DuckDB oracle recomputes EVERYTHING from
    * the shared seed planes — signatures, codebook, codes, LUTs, ADC
    * folds, shortlist, rerank — with no index anywhere; a hash match
    * proves the persisted codes + codebook + buckets serve exactly what
    * a from-scratch computation would.
    */
  def q164AnnPqIndexProbe(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val path = ensureQ163Index(s, dir)
    annPqIndexProbe(s, path,
      newVecs = emb.filter(col("vec_id") % 10 === 0),
      coldVecs = emb.filter(col("vec_id") % 10 =!= 0))
  }

  def q164Sql: String = {
    val H = graft.functions.Hyperplanes
    val M = H.pqM
    val K = 1 << annPqBits
    val sig = H.duckBucketsSql("embedding", annPqGeometry._1, annPqGeometry._2)
    val nt = annPqGeometry._2
    s"""WITH corp AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
       ${pqCteSql("corp", "embedding", annPqBits, "q.vec_id % 10 = 0")},
       ${pqHierCodesCtes(annPqBeam, annPqGroupSize, refine = true)},
       sig AS (SELECT vec_id, $sig AS sig FROM embeddings),
       cands AS (
         SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
         FROM sig q JOIN sig n ON q.vec_id <> n.vec_id
         WHERE q.vec_id % 10 = 0 AND n.vec_id % 10 <> 0
           AND list_contains([q.sig[i] = n.sig[i] FOR i IN generate_series(1, $nt)], true)),
       adc AS (
         SELECT ca.query_id, ca.neighbor_id,
                list_reduce([l.lut[mm * $K + c.codes[mm + 1] + 1]
                             FOR mm IN generate_series(0, ${M - 1})], (acc, v) -> acc + v) AS adc
         FROM cands ca JOIN hcodes c ON ca.neighbor_id = c.vec_id
              JOIN lut l ON l.query_id = ca.query_id),
       $pqTailSql"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q125_hybrid_retrieval" -> (q125HybridRetrieval _),
    "q124_hard_negatives" -> (q124HardNegatives _),
    "q55_ann_bruteforce" -> (q55AnnBruteforce _),
    "q56_ann_lsh" -> (q56AnnLsh _),
    "q58_ann_ivf" -> (q58AnnIvf _),
    "q84_ann_multiprobe" -> (q84AnnMultiprobe _),
    "q87_ann_quant_rescore" -> (q87AnnQuantRescore _),
    "q107_semantic_dedup" -> (q107SemanticDedup _),
    "q111_semantic_dedup_scaled" -> (q111SemanticDedupScaled _),
    "q140_ann_index_probe" -> (q140AnnIndexProbe _),
    "q144_ann_index_build" -> (q144AnnIndexBuild _),
    "q147_semantic_dedup_1k" -> (q147SemanticDedup1k _),
    "q150_semantic_dedup_hier" -> (q150SemanticDedupHier _),
    "q154_ann_pq_adc" -> (q154AnnPqAdc _),
    "q155_ann_ivf_pq" -> (q155AnnIvfPq _),
    "q156_ann_ivfpq_residual" -> (q156AnnIvfPqResidual _),
    "q159_ann_pq8" -> (q159AnnPq8 _),
    "q160_ann_pq8_hier" -> (q160AnnPq8Hier _),
    "q161_ann_pq8_hier_beam" -> (q161AnnPq8HierBeam _),
    "q163_ann_pq_index_build" -> (q163AnnPqIndexBuild _),
    "q164_ann_pq_index_probe" -> (q164AnnPqIndexProbe _),
    "q165_ann_pq8_lloyd" -> (q165AnnPq8Lloyd _))

  val oracle: Map[String, String] = Map(
    "q125_hybrid_retrieval" -> q125Sql,
    "q124_hard_negatives" -> q124Sql,
    "q55_ann_bruteforce" -> q55Sql,
    "q56_ann_lsh" -> q56Sql,
    "q58_ann_ivf" -> q58Sql,
    "q84_ann_multiprobe" -> q84Sql,
    "q87_ann_quant_rescore" -> q87Sql,
    "q107_semantic_dedup" -> q107Sql,
    "q111_semantic_dedup_scaled" -> q111Sql,
    "q140_ann_index_probe" -> q140Sql,
    "q144_ann_index_build" -> q144Sql,
    "q147_semantic_dedup_1k" -> q147Sql,
    "q150_semantic_dedup_hier" -> q150Sql,
    "q154_ann_pq_adc" -> q154Sql,
    "q155_ann_ivf_pq" -> q155Sql,
    "q156_ann_ivfpq_residual" -> q156Sql,
    "q159_ann_pq8" -> q159Sql,
    "q160_ann_pq8_hier" -> q160Sql,
    "q161_ann_pq8_hier_beam" -> q161Sql,
    "q163_ann_pq_index_build" -> q163Sql,
    "q164_ann_pq_index_probe" -> q164Sql,
    "q165_ann_pq8_lloyd" -> q165Sql)
}
