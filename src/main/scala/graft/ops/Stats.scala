package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Robust / distributional statistics over corpus columns — the outlier
  * audits and quantile reports a curation stack runs next to the quality
  * heuristics ([[TextAnalysis]]). All three operators are deterministic by
  * construction (integer or exact-binary-fraction arithmetic), so the
  * DuckDB oracle hash-matches bit for bit.
  */
object Stats {

  /** Exact per-group median via the SORT-BASED window formulation:
    * row_number + partition count, keep the middle row(s), average them.
    * Deliberately NOT Spark's `percentile` aggregate, which buffers every
    * group's values in executor memory (an OOM hazard when one group holds
    * a corpus-scale slice); the window formulation is a shuffle-sort that
    * SPILLS, and ties need no ordering beyond the value itself (any
    * permutation of equal values leaves the middle VALUES unchanged).
    * At 100 TB you'd swap in `approx_percentile` (a mergeable KLL-style
    * sketch) and keep this as the audit path — same posture as
    * [[Sketches.kmvDistinct]] vs exact COUNT(DISTINCT).
    */
  private def groupMedian(df: DataFrame, key: String, v: String, out: String): DataFrame = {
    val byKey = Window.partitionBy(col(key))
    df.withColumn("_rn", row_number().over(byKey.orderBy(col(v).asc)))
      .withColumn("_cnt", count(lit(1)).over(byKey))
      .filter(col("_rn") === expr("(_cnt + 1) DIV 2") ||
        col("_rn") === expr("(_cnt + 2) DIV 2"))
      .groupBy(col(key)).agg(avg(col(v)).as(out))
  }

  /** Median-absolute-deviation outlier audit per source: a document is
    * flagged when |n_chars − median| > 3·MAD — the robust fence that a
    * mean/stddev z-score cannot give on heavy-tailed length
    * distributions (one 10 MB document drags a mean fence past every
    * other outlier; it moves a median fence by at most one rank).
    *
    * Exactness: n_chars is integer, so the first median is a multiple of
    * 0.5, deviations are multiples of 0.5, and the second median is a
    * multiple of 0.25 — all exact binary fractions in DOUBLE; comparisons
    * and the 3× scaling cannot round. Zero-MAD groups (over half the
    * group at one length) degrade to flagging any deviation, identically
    * in both engines.
    *
    * Scale shape: two sort-shuffles keyed on source (each spillable, see
    * [[groupMedian]]), then one broadcast-sized join of the per-source
    * (median, MAD) pair back onto the deviation frame. The flagged set —
    * not the corpus — is the output.
    */
  def madOutliers(docs: DataFrame, fence: Double = 3.0): DataFrame = {
    val med = groupMedian(docs.select(col("source"), col("n_chars")),
      "source", "n_chars", "med")
    val dev = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(med), "source")
      .withColumn("dev", abs(col("n_chars") - col("med")))
    val mad = groupMedian(dev.select(col("source"), col("dev")),
      "source", "dev", "mad")
    dev.join(broadcast(mad), "source")
      .filter(col("dev") > lit(fence) * col("mad"))
      .select(col("source"), col("doc_id"), col("n_chars"),
        col("med"), col("mad"), col("dev"))
      .orderBy(col("source"), col("doc_id"))
  }

  def q134MadOutliers(s: SparkSession, dir: String): DataFrame =
    madOutliers(t(s, dir, "documents"))

  val q134Sql: String =
    """WITH med AS (SELECT source, median(n_chars) AS med
                  FROM documents GROUP BY 1),
       dev AS (SELECT d.doc_id, d.source, d.n_chars, m.med,
                      ABS(d.n_chars - m.med) AS dev
               FROM documents d JOIN med m USING (source)),
       mad AS (SELECT source, median(dev) AS mad FROM dev GROUP BY 1)
       SELECT d.source, d.doc_id, d.n_chars, d.med, m.mad, d.dev
       FROM dev d JOIN mad m USING (source)
       WHERE d.dev > 3.0 * m.mad
       ORDER BY d.source, d.doc_id"""

  /** Fixed-width histogram quantile report per source — the MERGEABLE
    * sketch shape: per-partition (source, bin) counts combine map-side,
    * merge by addition, and the quantile read-off walks the cumulative
    * histogram. This is the one-pass bounded-state path a 100 TB corpus
    * uses where the exact median of [[madOutliers]] would need a full
    * sort; the trade is bin-width resolution (100 chars here), reported
    * honestly as the bin UPPER edge, so the answer is exact integer
    * arithmetic end to end and both engines agree bit for bit.
    *
    * The read-off `cum·100 ≥ p·total` stays in BIGINT (no double
    * division), picking the first bin whose cumulative count reaches the
    * rank — ceil semantics, identical on both engines.
    */
  def histogramQuantiles(docs: DataFrame, binWidth: Long = 100L): DataFrame = {
    val hist = docs
      .select(col("source"), expr(s"n_chars DIV $binWidth").as("bin"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy(col("source"))
    val cum = hist
      .withColumn("cum", sum(col("n")).over(
        bySrc.orderBy(col("bin").asc).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total", sum(col("n")).over(bySrc))
      .withColumn("ub", (col("bin") + 1) * binWidth)
    cum.groupBy(col("source"))
      .agg(
        max(col("total")).as("n_docs"),
        count(lit(1)).as("n_bins"),
        min(when(col("cum") * 100 >= col("total") * 50, col("ub"))).as("p50_ub"),
        min(when(col("cum") * 100 >= col("total") * 90, col("ub"))).as("p90_ub"),
        min(when(col("cum") * 100 >= col("total") * 99, col("ub"))).as("p99_ub"))
      .orderBy(col("source"))
  }

  def q135HistQuantiles(s: SparkSession, dir: String): DataFrame =
    histogramQuantiles(t(s, dir, "documents"))

  val q135Sql: String =
    """WITH hist AS (SELECT source, n_chars // 100 AS bin, COUNT(*) AS n
                   FROM documents GROUP BY 1, 2),
       cum AS (SELECT source, bin, n,
                      SUM(n) OVER (PARTITION BY source ORDER BY bin ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                      SUM(n) OVER (PARTITION BY source) AS total,
                      (bin + 1) * 100 AS ub
               FROM hist)
       SELECT source,
              CAST(MAX(total) AS BIGINT) AS n_docs,
              COUNT(*) AS n_bins,
              MIN(CASE WHEN cum * 100 >= total * 50 THEN ub END) AS p50_ub,
              MIN(CASE WHEN cum * 100 >= total * 90 THEN ub END) AS p90_ub,
              MIN(CASE WHEN cum * 100 >= total * 99 THEN ub END) AS p99_ub
       FROM cum GROUP BY source ORDER BY source"""

  /** Exponentially-decay-weighted trailing value per user (EWMA over the
    * last 8 events, decay 0.9) — the smoothing pass monitoring and
    * anomaly pipelines run over per-key event streams. The bounded frame
    * makes the weights FIXED integers w_j = 9^j·10^(7−j) (= 0.9^j scaled
    * by 10^7), so the weighted sum is exact BIGINT — no recursive
    * float state whose rounding would drift across engines — and only
    * the final normalization divides (once, rounded once).
    *
    * Scale shape: one shuffle partitions by user_id; the 8 lag() calls
    * share a single exchange+sort (one WindowExec); state per row is 8
    * longs. Overflow headroom: 10^5 cents × 5.7·10^7 weight-sum ≈
    * 5.7·10^12 ≪ 2^63.
    */
  private val ewmaWeights: Seq[Long] =
    (0 until 8).map(j => math.pow(9, j).toLong * math.pow(10, 7 - j).toLong)

  def decayTrailing(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val terms = ewmaWeights.zipWithIndex.map { case (w, j) =>
      coalesce(lag(col("cents"), j).over(byUser), lit(0L)) * lit(w)
    }.reduce(_ + _)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      .withColumn("ewma_fx", terms)
      .withColumn("ewma_r",
        round(col("ewma_fx").cast("double") / lit(ewmaWeights.sum.toDouble), 6))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("cents"), col("ewma_fx"), col("ewma_r"))
  }

  def q136DecayTrailing(s: SparkSession, dir: String): DataFrame =
    decayTrailing(t(s, dir, "events")).orderBy(col("user_id"), col("event_id"))

  /** Oracle: identical lag terms with identical literal weights (built
    * from the same Scala array), the same single division and rounding.
    */
  val q136Sql: String = {
    val terms = ewmaWeights.zipWithIndex.map { case (w, j) =>
      if (j == 0) s"cents * $w"
      else s"COALESCE(LAG(cents, $j) OVER w, 0) * $w"
    }.mkString(" + ")
    s"""WITH e AS (SELECT user_id, event_id, ts,
                        CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events),
       s AS (SELECT user_id, event_id, ts, cents,
                    $terms AS ewma_fx
             FROM e
             WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
       SELECT user_id, event_id, ts, cents, ewma_fx,
              ROUND(CAST(ewma_fx AS DOUBLE) / ${ewmaWeights.sum}.0, 6) AS ewma_r
       FROM s ORDER BY user_id, event_id"""
  }

  /** q138 — the MERGEABLE posture of q134 (the q128→q128b pattern applied
    * to robust stats): both medians read off fixed-width histograms
    * instead of sort-windows, so per-source state is bin-bounded
    * (map-side-combined (source, bin) counts; the cumulative window runs
    * over sources × bins rows, never the corpus), and the whole fence is
    * exact BIGINT arithmetic — the median is reported as its bin's upper
    * edge (q135's honest convention), the deviation median likewise, and
    * `dev > fence · mad_ub` is an integer comparison both engines decide
    * identically. At 100 TB this is the path you actually run: two
    * broadcast-sized histogram aggregations + two broadcast-back joins,
    * zero corpus-wide sorts; q134 stays as the exact audit (its scaladoc
    * already promised exactly this swap).
    *
    * Resolution honesty: mad_ub ≥ true MAD by at most one bin, so the
    * histogram fence is (slightly) more conservative — it can only
    * UNDER-flag relative to the exact fence by the bin-width margin,
    * never over-flag spuriously; StatsGraphSpec pins flagged ⊆ exact
    * -fence-with-slack on the hot fixture.
    */
  def madOutliersHist(docs: DataFrame, fence: Long = 3L, binWidth: Long = 100L): DataFrame = {
    def histMedianUb(df: DataFrame, v: String, out: String): DataFrame = {
      val bySrc = Window.partitionBy(col("source"))
      df.select(col("source"), expr(s"$v DIV $binWidth").as("bin"))
        .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("n"))
        .withColumn("cum", sum(col("n")).over(
          bySrc.orderBy(col("bin").asc).rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("total", sum(col("n")).over(bySrc))
        .filter(col("cum") * 2 >= col("total"))
        .groupBy(col("source"))
        .agg(((min(col("bin")) + 1) * binWidth).as(out))
    }
    val med = histMedianUb(docs.select(col("source"), col("n_chars")), "n_chars", "med_ub")
    val dev = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(med), "source")
      .withColumn("dev", abs(col("n_chars") - col("med_ub")))
    val mad = histMedianUb(dev.select(col("source"), col("dev")), "dev", "mad_ub")
    dev.join(broadcast(mad), "source")
      .filter(col("dev") > lit(fence) * col("mad_ub"))
      .select(col("source"), col("doc_id"), col("n_chars"),
        col("med_ub"), col("mad_ub"), col("dev"))
      .orderBy(col("source"), col("doc_id"))
  }

  def q138MadOutliersHist(s: SparkSession, dir: String): DataFrame =
    madOutliersHist(t(s, dir, "documents"))

  val q138Sql: String =
    """WITH h1 AS (SELECT source, n_chars // 100 AS bin, COUNT(*) AS n
                 FROM documents GROUP BY 1, 2),
       c1 AS (SELECT source, bin,
                     SUM(n) OVER (PARTITION BY source ORDER BY bin ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     SUM(n) OVER (PARTITION BY source) AS total
              FROM h1),
       m1 AS (SELECT source, (MIN(bin) + 1) * 100 AS med_ub
              FROM c1 WHERE cum * 2 >= total GROUP BY source),
       d AS (SELECT doc_id, dd.source, n_chars, med_ub,
                    ABS(n_chars - med_ub) AS dev
             FROM documents dd JOIN m1 USING (source)),
       h2 AS (SELECT source, dev // 100 AS bin, COUNT(*) AS n FROM d GROUP BY 1, 2),
       c2 AS (SELECT source, bin,
                     SUM(n) OVER (PARTITION BY source ORDER BY bin ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     SUM(n) OVER (PARTITION BY source) AS total
              FROM h2),
       m2 AS (SELECT source, (MIN(bin) + 1) * 100 AS mad_ub
              FROM c2 WHERE cum * 2 >= total GROUP BY source)
       SELECT d.source, d.doc_id, d.n_chars, d.med_ub, m2.mad_ub, d.dev
       FROM d JOIN m2 USING (source)
       WHERE d.dev > 3 * m2.mad_ub
       ORDER BY d.source, d.doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_mad_outliers_hist" -> (q138MadOutliersHist _),
    "q134_mad_outliers" -> (q134MadOutliers _),
    "q135_hist_quantiles" -> (q135HistQuantiles _),
    "q136_decay_trailing" -> (q136DecayTrailing _))

  val oracle: Map[String, String] = Map(
    "q138_mad_outliers_hist" -> q138Sql,
    "q134_mad_outliers" -> q134Sql,
    "q135_hist_quantiles" -> q135Sql,
    "q136_decay_trailing" -> q136Sql)
}
