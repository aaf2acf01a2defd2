package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Pipeline-composition operators: the curation steps a production
  * training-data pipeline runs ON TOP of the primitive dedup/quality
  * signals (north-star extension surface; the reference has nothing
  * comparable — its dataflow ends at a top-5 count,
  * SparkApplication.scala:57-95).
  *
  *   - containment (sub-document) dedup                     → q90
  *   - contamination fraction scoring                       → q91
  *   - multi-stage quality funnel report                    → q92
  *   - train/test split leakage detection                   → q93
  *   - incremental batch-vs-corpus dedup                    → q94
  *
  * Scale design: every operator reuses the inverted-index / hashed-shingle
  * formulations from [[Dedup]] (no O(n²) anywhere), and the composition
  * layers are joins/aggregates on ids and counts — never on text.
  */
object Pipeline {

  /** SYMMETRIC containment pairs: C = |A∩B| / min(|A|,|B|) over word-3-gram
    * shingle sets, one id1 < id2 row per pair. Catches the sub-document
    * duplicates Jaccard misses — a short doc fully embedded in a long one
    * has J = |A|/|B| (small) but C = 1.0. Direction is recoverable from the
    * per-side scores (ADVICE r4): `cont1` = |∩|/|A| (share of doc id1
    * covered), `cont2` = |∩|/|B| — the CONTAINED document is the one whose
    * score is ~1.0. This is the standard complement to Jaccard dedup for
    * boilerplate-wrapped copies (same inverted-index shape as
    * [[Dedup.jaccardNearDups]]: candidates only for co-shingled pairs,
    * count-proportional verify, one shuffle on an 8-byte hash).
    */
  def containmentPairs(docs: DataFrame, threshold: Double = 0.9,
                       handle: StorageHandle = StorageHandle.sessionDefault()): DataFrame = {
    val sh = handle.pin(Dedup.hashedShingles(docs))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.as("a")
      .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("id2") === col("s2.doc_id"))
      .select(col("id1"), col("id2"), col("s1.n").as("n1"), col("s2.n").as("n2"),
        (col("c").cast("double") / col("s1.n")).as("cont1"),
        (col("c").cast("double") / col("s2.n")).as("cont2"),
        (col("c").cast("double") / least(col("s1.n"), col("s2.n"))).as("containment"))
      .filter(col("containment") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  def q90ContainmentDedup(s: SparkSession, dir: String): DataFrame =
    containmentPairs(t(s, dir, "documents"))

  val q90Sql: String =
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
              FROM docs, UNNEST(generate_series(1, greatest(len(toks)-2, 0))) AS t(i)),
       sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
                  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       SELECT id1, id2, s1.n AS n1, s2.n AS n2,
              c * 1.0 / s1.n AS cont1,
              c * 1.0 / s2.n AS cont2,
              c * 1.0 / LEAST(s1.n, s2.n) AS containment
       FROM common JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
       WHERE c * 1.0 / LEAST(s1.n, s2.n) >= 0.9
       ORDER BY id1, id2"""

  /** Contamination FRACTION (q76 upgraded from a binary hit to a score):
    * per train document, the share of its distinct 5-gram shingles that
    * appear in any eval document, flagged at ≥ 5%. This is the graded
    * decontamination verdict real pipelines threshold on (a single shared
    * shingle is noise; 5% overlap is a leak). Same broadcast shape and
    * validity caveat as q76: the eval side is a fixed-size benchmark, so
    * its shingle set broadcasts; the corpus streams through map-side.
    */
  def q91ContaminationFrac(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sh5 = Curation.shingles5(docs)
    val evalSh = sh5.filter(col("doc_id") % 97 === 0).select(col("shingle")).distinct()
    val trainSh = sh5.filter(col("doc_id") % 97 =!= 0)
    val perDoc = trainSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = trainSh.join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    docs.filter(col("doc_id") % 97 =!= 0).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(coalesce(col("n_shingles"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_shingles"), 6))
          .as("contam_frac"))
      .withColumn("flagged", col("contam_frac") >= 0.05)
      .orderBy(col("doc_id"))
  }

  val q91Sql: String =
    """WITH sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle
               FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                    UNNEST(generate_series(1, greatest(len(toks)-4, 0))) AS t(i)),
       ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
       per_doc AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh
                   WHERE doc_id % 97 <> 0 GROUP BY 1),
       hits AS (SELECT doc_id, COUNT(*) AS n_hit
                FROM sh JOIN ev USING (shingle) WHERE doc_id % 97 <> 0 GROUP BY 1)
       SELECT d.doc_id,
              COALESCE(p.n_shingles, 0) AS n_shingles,
              COALESCE(h.n_hit, 0) AS n_hit,
              CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN 0.0
                   ELSE ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / p.n_shingles, 6)
              END AS contam_frac,
              CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN FALSE
                   ELSE ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / p.n_shingles, 6) >= 0.05
              END AS flagged
       FROM documents d
       LEFT JOIN per_doc p ON d.doc_id = p.doc_id
       LEFT JOIN hits h ON d.doc_id = h.doc_id
       WHERE d.doc_id % 97 <> 0 ORDER BY d.doc_id"""

  /** Multi-stage quality funnel: the per-source survival report every
    * curation run publishes — how many documents pass each CUMULATIVE
    * stage (length → type-token ratio → repetition → exact-dedup
    * canonical). Composes q61/q77/q50's signals as per-row expressions plus
    * one window over the content hash; the report itself is a conditional
    * aggregate, so the whole funnel is two shuffles (hash window + source
    * rollup) regardless of corpus size. All outputs are integer counts —
    * bit-exact cross-engine.
    */
  def q92QualityFunnel(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("ttr",
        size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
      .withColumn("grams", expr(
        """IF(size(toks) >= 2,
              transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2))),
              array())"""))
      .withColumn("rep_frac",
        when(size(col("grams")) === 0, lit(0.0))
          .otherwise(lit(1.0) -
            size(array_distinct(col("grams"))).cast("double") / size(col("grams"))))
      .withColumn("canonical",
        col("doc_id") === min(col("doc_id")).over(
          Window.partitionBy(md5(col("text").cast("binary")))))
    val s1 = col("n_tokens") >= 20
    val s2 = s1 && col("ttr") >= 0.5
    val s3 = s2 && col("rep_frac") <= 0.55
    val s4 = s3 && col("canonical")
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(s1, 1L).otherwise(0L)).as("n_len"),
        sum(when(s2, 1L).otherwise(0L)).as("n_ttr"),
        sum(when(s3, 1L).otherwise(0L)).as("n_rep"),
        sum(when(s4, 1L).otherwise(0L)).as("n_final"))
      .orderBy(col("source"))
  }

  val q92Sql: String =
    """WITH d AS (
         SELECT source, doc_id, text, string_split(text, ' ') AS toks FROM documents),
       scored AS (
         SELECT source, doc_id,
                CAST(len(toks) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
                CASE WHEN len(toks) < 2 THEN 0.0
                     ELSE 1.0 - CAST(len(list_distinct(
                              [array_to_string(toks[i:i+1], ' ')
                               FOR i IN generate_series(1, len(toks) - 1)])) AS DOUBLE)
                            / (len(toks) - 1)
                END AS rep_frac,
                doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical
         FROM d)
       SELECT source,
              COUNT(*) AS n_total,
              CAST(SUM(CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
              CAST(SUM(CASE WHEN n_tokens >= 20 AND ttr >= 0.5
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ttr,
              CAST(SUM(CASE WHEN n_tokens >= 20 AND ttr >= 0.5 AND rep_frac <= 0.55
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
              CAST(SUM(CASE WHEN n_tokens >= 20 AND ttr >= 0.5 AND rep_frac <= 0.55
                            AND canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_final
       FROM scored GROUP BY source ORDER BY source"""

  /** Train/test split leakage: near-dup pairs (J ≥ 0.6, q51's exact miner)
    * that STRADDLE the deterministic q80 split — the audit that catches
    * "my eval doc has a paraphrase in train". Pure composition: the pair
    * set joins the per-doc split assignment twice (id-keyed broadcast-able
    * map), so the audit costs two cheap joins on top of the dedup pass a
    * pipeline already runs.
    */
  def q93SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val splits = docs.select(col("doc_id"))
      .withColumn("b", Curation.splitBucketCol)
      .select(col("doc_id"), Curation.splitNameCol(col("b")).as("split"))
    Dedup.jaccardNearDups(docs, sorted = false)
      .join(splits.select(col("doc_id").as("id1"), col("split").as("split1")), Seq("id1"))
      .join(splits.select(col("doc_id").as("id2"), col("split").as("split2")), Seq("id2"))
      .filter(col("split1") =!= col("split2"))
      .select(col("id1"), col("id2"), col("jaccard"), col("split1"), col("split2"))
      .orderBy(col("id1"), col("id2"))
  }

  val q93Sql: String =
    s"""WITH pairs AS (SELECT id1, id2, jaccard FROM (${Dedup.q51Pairs})),
       splits AS (
         SELECT doc_id,
                CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                      list_reduce([strpos('0123456789abcdef',
                                    substring(md5('split:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1
                                   FOR i IN generate_series(1, 8)]::BIGINT[],
                                  (a, v) -> a * 16 + v) % 100 AS b
               FROM documents))
       SELECT id1, id2, jaccard, s1.split AS split1, s2.split AS split2
       FROM pairs
       JOIN splits s1 ON id1 = s1.doc_id JOIN splits s2 ON id2 = s2.doc_id
       WHERE s1.split <> s2.split ORDER BY id1, id2"""

  /** Incremental corpus update: dedup a NEW batch (sources src10+) against
    * the EXISTING corpus (src0–src9) without re-pairing the existing side
    * against itself — the shape of every nightly ingest. Per new document:
    * how many existing near-dups (J ≥ 0.6), the best match
    * (argmax jaccard, ties to min existing id), and a novelty verdict.
    *
    * Scale shape: the inverted index is built per side and joined
    * CROSS-BATCH only (the a.existing × b.new predicate cuts the candidate
    * space before the pair aggregate); in production the existing side's
    * hashed-shingle index is a persisted table, so a nightly run pays one
    * index build for the new batch plus one bucket join.
    */
  def q94IncrementalDedup(s: SparkSession, dir: String,
                          handle: StorageHandle = StorageHandle.sessionDefault()): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("src_num", expr("CAST(substring(source, 4) AS INT)"))
    // Pinned: sh feeds sizes plus both sides of the cross-batch join
    // (same cache-lifecycle contract as jaccardNearDups).
    val sh = handle.pin(Dedup.hashedShingles(docs.select(col("doc_id"), col("text")))
      .join(docs.select(col("doc_id"), (col("src_num") >= 10).as("is_new")), Seq("doc_id")))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.filter(!col("is_new")).as("a")
      .join(sh.filter(col("is_new")).as("b"), col("a.h") === col("b.h"))
      .groupBy(col("b.doc_id").as("new_id"), col("a.doc_id").as("old_id"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("s1"), col("new_id") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("old_id") === col("s2.doc_id"))
      .select(col("new_id"), col("old_id"),
        (col("c").cast("double") / (col("s1.n") + col("s2.n") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
    val best = pairs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("new_id")).orderBy(col("jaccard").desc, col("old_id").asc)))
      .groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_matches"),
        max(when(col("rk") === 1, col("old_id"))).as("best_match_id"),
        max(when(col("rk") === 1, col("jaccard"))).as("best_jaccard"))
    docs.filter(col("src_num") >= 10).select(col("doc_id"))
      .join(best, col("doc_id") === col("new_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_match_id"), lit(-1L)).as("best_match_id"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
        col("n_matches").isNull.as("is_novel"))
      .orderBy(col("doc_id"))
  }

  val q94Sql: String =
    """WITH docs AS (SELECT doc_id, CAST(substring(source, 4) AS INT) >= 10 AS is_new,
                string_split(text, ' ') AS toks FROM documents),
       sh AS (SELECT DISTINCT doc_id, is_new, array_to_string(toks[i:i+2], ' ') AS shingle
              FROM docs, UNNEST(generate_series(1, greatest(len(toks)-2, 0))) AS t(i)),
       sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       pairs AS (
         SELECT b.doc_id AS new_id, a.doc_id AS old_id,
                COUNT(*) * 1.0 / (s1.n + s2.n - COUNT(*)) AS jaccard
         FROM sh a JOIN sh b USING (shingle)
         JOIN sizes s1 ON b.doc_id = s1.doc_id
         JOIN sizes s2 ON a.doc_id = s2.doc_id
         WHERE NOT a.is_new AND b.is_new
         GROUP BY 1, 2, s1.n, s2.n
         HAVING COUNT(*) * 1.0 / (s1.n + s2.n - COUNT(*)) >= 0.6),
       best AS (
         SELECT new_id, COUNT(*) AS n_matches,
                MAX(CASE WHEN rk = 1 THEN old_id END) AS best_match_id,
                MAX(CASE WHEN rk = 1 THEN jaccard END) AS best_jaccard
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY new_id
                         ORDER BY jaccard DESC, old_id ASC) AS rk FROM pairs)
         GROUP BY 1)
       SELECT d.doc_id,
              COALESCE(b.n_matches, 0) AS n_matches,
              COALESCE(b.best_match_id, -1) AS best_match_id,
              COALESCE(b.best_jaccard, 0.0) AS best_jaccard,
              b.n_matches IS NULL AS is_novel
       FROM docs d LEFT JOIN best b ON d.doc_id = b.new_id
       WHERE d.is_new ORDER BY d.doc_id"""

  /** End-to-end curation manifest — the capstone composition: ONE DataFrame
    * DAG that runs the whole curation pipeline over a corpus and emits the
    * per-document audit row real pipelines persist next to the data:
    *
    *   exact dedup (md5 canonical) → near-dup cluster keeper (MinHash-mined
    *   edges + pointer-doubling components + quality argmax) → quality gate
    *   (length + TTR) → benchmark decontamination → split assignment →
    *   `selected` verdict.
    *
    * Every stage is the library operator it names (q50/q86/q92/q76/q80
    * semantics respectively) — this query exists to prove they COMPOSE: one
    * `documents` scan fans out to five branches that rejoin on doc_id, so
    * Catalyst shares the scan and each stage's shuffle key is the one its
    * operator already needed. At 100 TB the manifest is exactly this plan
    * plus a [[Layout.writeRangeClustered]] of the result by doc_id.
    */
  def q95CurationManifest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val exact = docs.select(col("doc_id"),
      (col("doc_id") === min(col("doc_id")).over(
        Window.partitionBy(md5(col("text").cast("binary"))))).as("exact_canonical"))
    val pairs = Dedup.minhashNearDups(docs, sorted = false)
      .select(col("id1"), col("id2"))
    // Pinned (r13): the keeper argmax and the final manifest join both
    // read the quality frame — un-pinned, each reference re-ran the
    // text split + distinct over the full corpus (guide §2.4). Three
    // narrow numeric columns, far smaller than the text it derives from.
    val quality = StorageHandle.sessionDefault().pin(docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks"))).as("ttr")))
    val keeper = Curation.connectedComponents(docs.select(col("doc_id")), pairs)
      .join(quality.select(col("doc_id"), col("ttr")), "doc_id")
      .withColumn("keeper_id", first(col("doc_id")).over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("ttr").desc, col("doc_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("doc_id"), (col("doc_id") === col("keeper_id")).as("is_keeper"))
    val sh5 = Curation.shingles5(docs)
    val contam = sh5.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(sh5.filter(col("doc_id") % 97 === 0).select(col("shingle")).distinct()),
        Seq("shingle"))
      .select(col("doc_id")).distinct()
      .withColumn("hit", lit(true))
    val splits = docs.select(col("doc_id"))
      .withColumn("b", Curation.splitBucketCol)
      .select(col("doc_id"), Curation.splitNameCol(col("b")).as("split"))
    docs.select(col("doc_id"))
      .join(exact, "doc_id")
      .join(keeper, "doc_id")
      .join(quality, "doc_id")
      .join(contam, Seq("doc_id"), "left")
      .join(splits, "doc_id")
      .withColumn("quality_ok", col("n_tokens") >= 20 && col("ttr") >= 0.5)
      .withColumn("contaminated", coalesce(col("hit"), lit(false)))
      .withColumn("is_eval", col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("exact_canonical"), col("is_keeper"),
        col("quality_ok"), col("contaminated"), col("is_eval"), col("split"),
        (col("exact_canonical") && col("is_keeper") && col("quality_ok") &&
          !col("contaminated") && !col("is_eval")).as("selected"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the literal SQL composition of the five stage oracles —
    * q86Sql's recursive transitive closure + keeper argmax, q50's md5
    * canonical window, q92's length/TTR gate, q76's contamination
    * semi-join, q80's md5 bucket split.
    */
  val q95Sql: String =
    s"""WITH RECURSIVE pairs AS (SELECT id1, id2 FROM (${Dedup.q51Pairs})),
       edges AS (SELECT id1 AS src, id2 AS dst FROM pairs
                 UNION ALL SELECT id2, id1 FROM pairs),
       reach AS (SELECT src AS v, dst AS u FROM edges
                 UNION
                 SELECT r.v, e.dst FROM reach r JOIN edges e ON r.u = e.src),
       clusters AS (
         SELECT d.doc_id,
                CAST(LEAST(d.doc_id, COALESCE(MIN(r.u), d.doc_id)) AS BIGINT) AS cluster_id
         FROM documents d LEFT JOIN reach r ON d.doc_id = r.v GROUP BY d.doc_id),
       q AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                      / len(string_split(text, ' ')) AS ttr
             FROM documents),
       ranked AS (
         SELECT c.doc_id,
                FIRST_VALUE(c.doc_id) OVER (PARTITION BY c.cluster_id
                  ORDER BY q.ttr DESC, c.doc_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS keeper_id
         FROM clusters c JOIN q USING (doc_id)),
       exact AS (SELECT doc_id,
                        doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS exact_canonical
                 FROM documents),
       sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+4], ' ') AS shingle
              FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                   UNNEST(generate_series(1, greatest(len(toks)-4, 0))) AS t(i)),
       contam AS (SELECT DISTINCT tr.doc_id
                  FROM sh tr JOIN sh ev USING (shingle)
                  WHERE tr.doc_id % 97 <> 0 AND ev.doc_id % 97 = 0),
       splits AS (
         SELECT doc_id,
                CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                      list_reduce([strpos('0123456789abcdef',
                                    substring(md5('split:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1
                                   FOR i IN generate_series(1, 8)]::BIGINT[],
                                  (a, v) -> a * 16 + v) % 100 AS b
               FROM documents))
       SELECT d.doc_id, e.exact_canonical,
              r.doc_id = r.keeper_id AS is_keeper,
              q.n_tokens >= 20 AND q.ttr >= 0.5 AS quality_ok,
              c.doc_id IS NOT NULL AS contaminated,
              d.doc_id % 97 = 0 AS is_eval,
              s.split,
              e.exact_canonical AND r.doc_id = r.keeper_id
                AND q.n_tokens >= 20 AND q.ttr >= 0.5
                AND c.doc_id IS NULL AND d.doc_id % 97 <> 0 AS selected
       FROM documents d
       JOIN exact e USING (doc_id)
       JOIN ranked r USING (doc_id)
       JOIN q USING (doc_id)
       LEFT JOIN contam c ON d.doc_id = c.doc_id
       JOIN splits s USING (doc_id)
       ORDER BY d.doc_id"""

  /** Dup-pair FEATURE table — the input a learned dedup/reranker model
    * trains on: for every candidate pair (co-shingled, J ≥ 0.3 — a lower
    * bar than the q51 verdict threshold, because a classifier wants the
    * gray zone), four similarity signals:
    *
    *   jaccard      — 3-gram set overlap (q51's measure)
    *   containment  — overlap / smaller set (q90's measure)
    *   len_ratio    — token-count ratio min/max (cheap length prior)
    *   hamming      — 60-bit SimHash distance (q53's measure)
    *
    * Scale shape: candidates come from the same hashed inverted index as
    * q51 (never all-pairs); the three per-doc signal frames (set size,
    * token count, SimHash signature) are narrow id-keyed tables computed
    * in one pass each and joined back per side. SimHash signatures are the
    * codegen'd [[graft.functions.SimHashExpr]]; the oracle rebuilds them
    * from md5-derived token hashes bit-identically (q53's construction).
    */
  def q96PairFeatures(s: SparkSession, dir: String,
                      handle: StorageHandle = StorageHandle.sessionDefault()): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.functions.VectorExpressions.register(s)
    // Pinned: sh feeds sizes plus both self-join sides; meta (with its
    // per-doc SimHash) joins back once per pair side.
    val sh = handle.pin(Dedup.hashedShingles(docs))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val meta = handle.pin(docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr("graft_simhash(split(text, ' '))").as("sig")))
    sh.as("a")
      .join(sh.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("s1"), col("id1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("id2") === col("s2.doc_id"))
      .join(meta.as("m1"), col("id1") === col("m1.doc_id"))
      .join(meta.as("m2"), col("id2") === col("m2.doc_id"))
      .select(col("id1"), col("id2"),
        (col("c").cast("double") / (col("s1.n") + col("s2.n") - col("c"))).as("jaccard"),
        (col("c").cast("double") / least(col("s1.n"), col("s2.n"))).as("containment"),
        (least(col("m1.n_tokens"), col("m2.n_tokens")).cast("double") /
          greatest(col("m1.n_tokens"), col("m2.n_tokens"))).as("len_ratio"),
        expr("CAST(bit_count(m1.sig ^ m2.sig) AS BIGINT)").as("hamming"))
      .filter(col("jaccard") >= 0.3)
      .orderBy(col("id1"), col("id2"))
  }

  val q96Sql: String = {
    // 60-bit signatures (15 md5 hex chars) — q53's exact construction.
    val bitSums = (0 until 60)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN w ELSE -w END) AS s$i").mkString(", ")
    val sigBits = (0 until 60)
      .map(i => s"CASE WHEN s$i > 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END").mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
              FROM docs, UNNEST(generate_series(1, greatest(len(toks)-2, 0))) AS t(i)),
       sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       ntok AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM docs),
       tokh AS (
         SELECT doc_id,
                list_reduce([strpos('0123456789abcdef', substring(md5(tok), i, 1)) - 1
                             FOR i IN generate_series(1, 15)]::BIGINT[],
                            (a, v) -> a * 16 + v) AS h,
                COUNT(*) AS w
         FROM (SELECT doc_id, unnest(toks) AS tok FROM docs)
         GROUP BY 1, 2),
       bitsums AS (SELECT doc_id, $bitSums FROM tokh GROUP BY doc_id),
       sigs AS (SELECT doc_id, CAST($sigBits AS BIGINT) AS sig FROM bitsums),
       common AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
                  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       SELECT id1, id2,
              c * 1.0 / (s1.n + s2.n - c) AS jaccard,
              c * 1.0 / LEAST(s1.n, s2.n) AS containment,
              CAST(LEAST(t1.n_tokens, t2.n_tokens) AS DOUBLE)
                / GREATEST(t1.n_tokens, t2.n_tokens) AS len_ratio,
              CAST(bit_count(xor(g1.sig, g2.sig)) AS BIGINT) AS hamming
       FROM common
       JOIN sizes s1 ON id1 = s1.doc_id JOIN sizes s2 ON id2 = s2.doc_id
       JOIN ntok t1 ON id1 = t1.doc_id JOIN ntok t2 ON id2 = t2.doc_id
       JOIN sigs g1 ON id1 = g1.doc_id JOIN sigs g2 ON id2 = g2.doc_id
       WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.3
       ORDER BY id1, id2"""
  }

  /** Per-source duplication report — the first page of any corpus-health
    * dashboard: how much of each source is exact-duplicated or
    * near-duplicated (corpus-wide, so cross-source copies count for both
    * sides). Flags are computed once per document (semi-join against the
    * >1-copy hash groups; distinct membership in the J ≥ 0.6 pair set)
    * and aggregated in one groupBy(source) — counts are exact integers,
    * the single rate division happens once per group, so the report is
    * bit-stable cross-engine. Scale: the miner dominates (same budget as
    * q51); the report layer joins ids and flags only.
    */
  def q103SourceDupStats(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val hh = docs.select(col("doc_id"), md5(col("text").cast("binary")).as("hh"))
    val dupH = hh.groupBy(col("hh")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("hh"))
    val exactIds = hh.join(dupH, Seq("hh"), "left_semi")
      .select(col("doc_id")).withColumn("is_exact", lit(1L))
    // Pair mining via the MinHash+LSH path — returns the IDENTICAL
    // J ≥ 0.6 set as the inverted index (q52 is hash-checked against
    // q51's oracle) at a fraction of the cost, and it is the miner a
    // 100 TB health report would feed from (q73 makes the same choice).
    val nearIds = Dedup.minhashNearDups(docs, sorted = false)
      .select(explode(array(col("id1"), col("id2"))).as("doc_id"))
      .distinct().withColumn("is_near", lit(1L))
    docs.select(col("doc_id"), col("source"))
      .join(exactIds, Seq("doc_id"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_exact"), lit(0L))).as("n_exact_dup"),
        sum(coalesce(col("is_near"), lit(0L))).as("n_near_dup"))
      .withColumn("exact_rate_r",
        round(col("n_exact_dup").cast("double") / col("n_docs"), 6))
      .orderBy(col("source"))
  }

  val q103Sql: String =
    s"""WITH pairs AS (SELECT id1, id2 FROM (${Dedup.q51Pairs})),
       near AS (SELECT DISTINCT doc_id FROM
                  (SELECT id1 AS doc_id FROM pairs UNION ALL SELECT id2 FROM pairs)),
       hh AS (SELECT doc_id, md5(text) AS h FROM documents),
       duph AS (SELECT h FROM hh GROUP BY h HAVING COUNT(*) > 1),
       flags AS (SELECT d.doc_id, d.source,
                        CASE WHEN hh.h IN (SELECT h FROM duph) THEN 1 ELSE 0 END AS is_exact,
                        CASE WHEN d.doc_id IN (SELECT doc_id FROM near) THEN 1 ELSE 0 END AS is_near
                 FROM documents d JOIN hh ON d.doc_id = hh.doc_id)
       SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(is_exact) AS BIGINT) AS n_exact_dup,
              CAST(SUM(is_near) AS BIGINT) AS n_near_dup,
              ROUND(CAST(SUM(is_exact) AS DOUBLE) / COUNT(*), 6) AS exact_rate_r
       FROM flags GROUP BY source ORDER BY source"""

  /** Cross-source duplication matrix: for every near-dup pair, which
    * source pair produced it — the report that tells a curation team
    * "source X is largely scraped copies of source Y". Source pairs are
    * canonicalized (least, greatest) so the matrix is upper-triangular
    * regardless of id order; the mean Jaccard is averaged in micro-units
    * (per-pair double rounded once to a BIGINT, summed exactly, divided
    * once) — the q99 fixed-point trick that makes a cross-engine mean of
    * doubles deterministic under any aggregation order.
    */
  def q104CrossSourceDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
    // MinHash-mined pairs — same set and same jaccard doubles as the
    // inverted index (see q103's miner note).
    Dedup.minhashNearDups(t(s, dir, "documents"), sorted = false)
      .join(docs.as("d1"), col("id1") === col("d1.doc_id"))
      .join(docs.as("d2"), col("id2") === col("d2.doc_id"))
      .select(least(col("d1.source"), col("d2.source")).as("source1"),
        greatest(col("d1.source"), col("d2.source")).as("source2"),
        expr("CAST(ROUND(jaccard * 1000000) AS BIGINT)").as("jfx"))
      .groupBy(col("source1"), col("source2"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("jfx")).cast("double") / count(lit(1)) / 1000000d, 6).as("avg_jaccard_r"))
      .orderBy(col("source1"), col("source2"))
  }

  val q104Sql: String =
    s"""WITH pairs AS (SELECT id1, id2, jaccard FROM (${Dedup.q51Pairs}))
       SELECT LEAST(d1.source, d2.source) AS source1,
              GREATEST(d1.source, d2.source) AS source2,
              COUNT(*) AS n_pairs,
              ROUND(CAST(SUM(CAST(ROUND(jaccard * 1000000) AS BIGINT)) AS DOUBLE)
                    / COUNT(*) / 1000000, 6) AS avg_jaccard_r
       FROM pairs JOIN documents d1 ON id1 = d1.doc_id
                  JOIN documents d2 ON id2 = d2.doc_id
       GROUP BY 1, 2 ORDER BY source1, source2"""

  /** k-anonymity suppression report over the quasi-identifier
    * (lang, source) — the release-governance audit that pairs with q106's
    * PII scrub: a document whose quasi-identifier combination matches
    * fewer than k corpus rows is re-identifiable by join with an external
    * table, so the group must be suppressed or generalized before
    * release (Sweeney, IJUFKS 2002). Per group: size, the suppress
    * verdict at k, and whether GENERALIZING the identifier (dropping
    * `source`, keeping `lang`) rescues it — the generalize-then-recheck
    * step a real release pipeline runs.
    *
    * Scale: two partial-aggregated groupBys (one per identifier grain)
    * joined on the coarse key — group-count-sized frames only, the corpus
    * streams through once.
    */
  def q129KAnonymity(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val docs = t(s, dir, "documents")
    val fine = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val coarse = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
    fine.join(coarse, "lang")
      .withColumn("suppress", col("n_docs") < k)
      .withColumn("suppressed_after_generalize",
        col("n_docs") < k && col("n_lang") < k)
      .select(col("lang"), col("source"), col("n_docs"), col("suppress"),
        col("n_lang"), col("suppressed_after_generalize"))
      .orderBy(col("lang"), col("source"))
  }

  val q129Sql: String =
    """WITH fine AS (SELECT lang, source, COUNT(*) AS n_docs
                     FROM documents GROUP BY 1, 2),
       coarse AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1)
       SELECT f.lang, f.source, f.n_docs, f.n_docs < 5 AS suppress,
              c.n_lang, f.n_docs < 5 AND c.n_lang < 5 AS suppressed_after_generalize
       FROM fine f JOIN coarse c USING (lang)
       ORDER BY lang, source"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q129_k_anonymity" -> ((s, d) => q129KAnonymity(s, d)),
    "q103_source_dup_stats" -> (q103SourceDupStats _),
    "q104_cross_source_dups" -> (q104CrossSourceDups _),
    "q90_containment_dedup" -> (q90ContainmentDedup _),
    "q91_contamination_frac" -> (q91ContaminationFrac _),
    "q92_quality_funnel" -> (q92QualityFunnel _),
    "q93_split_leakage" -> (q93SplitLeakage _),
    "q94_incremental_dedup" -> ((s, d) => q94IncrementalDedup(s, d)),
    "q95_curation_manifest" -> (q95CurationManifest _),
    "q96_pair_features" -> ((s, d) => q96PairFeatures(s, d)))

  val oracle: Map[String, String] = Map(
    "q129_k_anonymity" -> q129Sql,
    "q103_source_dup_stats" -> q103Sql,
    "q104_cross_source_dups" -> q104Sql,
    "q90_containment_dedup" -> q90Sql,
    "q91_contamination_frac" -> q91Sql,
    "q92_quality_funnel" -> q92Sql,
    "q93_split_leakage" -> q93Sql,
    "q94_incremental_dedup" -> q94Sql,
    "q95_curation_manifest" -> q95Sql,
    "q96_pair_features" -> q96Sql)
}
