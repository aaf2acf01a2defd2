package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Statistical + structural aggregate surface (SURVEY.md §2.2 continuation):
  * moments, percentiles, ordered string agg, map functions, and a typed
  * `Aggregator` UDAF.
  *
  * Determinism discipline: moments are computed from exact DECIMAL power
  * sums ((Σx², Σx, n) — order-independent) with ONE final double
  * expression, not from streaming variance algorithms whose merge order
  * differs between engines. Percentile probes are powers-of-two fractions
  * over integer-valued doubles, so linear interpolation is FP-exact in
  * both engines.
  */
object Aggregates2 {

  /** Sample variance / stddev / correlation from exact decimal power sums.
    * var = (Σx² − (Σx)²/n) / (n−1); corr via the analogous cross-moment —
    * every intermediate is an exact decimal, so both engines do the same
    * handful of double ops at the end.
    */
  def q19Stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").as("sx"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").as("sxx"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").as("sy"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").as("syy"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 6).as("var_qty"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6).as("stddev_qty"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  // Final stats rounded to 6: the decimal->double cast of wide-scale sums
  // double-rounds in DuckDB (int128 -> double -> /10^scale) vs Spark's
  // single correctly-rounded BigDecimal conversion - a 1-ULP divergence
  // rounding absorbs.

  val q19Sql: String =
    """WITH m AS (
         SELECT l_returnflag, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
                CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
                CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
         FROM lineitem GROUP BY l_returnflag)
       SELECT l_returnflag, n,
              ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
              ROUND(SQRT((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
              ROUND((sxy - sx * sy / n) / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_qty_price
       FROM m ORDER BY l_returnflag"""

  /** Exact quartiles (type-7 linear interpolation) of integer-valued
    * l_quantity: probe fractions 1/4, 1/2, 3/4 make the interpolation
    * arithmetic exact in IEEE double, so Spark `percentile` and DuckDB
    * `quantile_cont` agree bit-for-bit.
    */
  def q27Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q1"),
        expr("percentile(l_quantity, 0.5)").as("median"),
        expr("percentile(l_quantity, 0.75)").as("q3"),
        min(col("l_quantity")).as("mn"),
        max(col("l_quantity")).as("mx"))
      .orderBy(col("l_returnflag"))

  val q27Sql: String =
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.25) AS q1,
              quantile_cont(l_quantity, 0.5) AS median,
              quantile_cont(l_quantity, 0.75) AS q3,
              MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Ordered string aggregation: deterministic via sort_array before the
    * concat (Spark collect_list order is partition-dependent; sorting
    * makes it reproducible — same contract as DuckDB's ORDER BY clause).
    */
  def q28StringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation")
      .join(t(s, dir, "supplier"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(concat_ws(",", sort_array(collect_list(col("s_name")))).as("suppliers"),
        count(lit(1)).as("n_supp"))
      .orderBy(col("n_name"))

  val q28Sql: String =
    """SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
              COUNT(*) AS n_supp
       FROM nation JOIN supplier ON s_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name"""

  /** Map-function round trip: per-user map<event_type, count> built with
    * map_from_entries, then map_keys/map_values/explode back to rows.
    * The relational result (user_id, event_type, n) is what the oracle
    * checks — the map detour proves the MapType machinery.
    */
  def q29MapFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
        .as("type_counts"))
      .select(col("user_id"), explode(col("type_counts")).as(Seq("event_type", "n")),
        size(col("type_counts")).cast("long").as("n_types"))
      .orderBy(col("user_id"), col("event_type"))

  val q29Sql: String =
    """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
       k AS (SELECT user_id, COUNT(*) AS n_types FROM c GROUP BY 1)
       SELECT c.user_id, c.event_type, c.n, k.n_types
       FROM c JOIN k ON c.user_id = k.user_id
       ORDER BY c.user_id, c.event_type"""

  // ---- typed Aggregator UDAF: bounded top-k heap (SURVEY.md §7.3) ----

  /** Per-group top-k as a typed Aggregator: the buffer is a bounded
    * min-heap (k entries max), merged associatively — map-side partials
    * carry ≤ k rows per group instead of the full partition sort a
    * row_number window needs. The scalable form of the reference's
    * global take(5) generalized per-key.
    */
  final case class KV(v: Double, id: Long)
  class TopK(k: Int) extends Aggregator[KV, List[KV], Seq[KV]] {
    override def zero: List[KV] = Nil
    private def trim(xs: List[KV]): List[KV] =
      xs.sortBy(x => (-x.v, x.id)).take(k)
    override def reduce(b: List[KV], a: KV): List[KV] = trim(a :: b)
    override def merge(b1: List[KV], b2: List[KV]): List[KV] = trim(b1 ::: b2)
    override def finish(r: List[KV]): Seq[KV] = trim(r)
    override def bufferEncoder: Encoder[List[KV]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[KV]]()
    override def outputEncoder: Encoder[Seq[KV]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KV]]()
  }

  /** Top-3 customers by balance per nation via the typed Aggregator,
    * exploded back to rows; oracle is the row_number formulation —
    * proving the heap aggregator computes exactly the window top-k.
    */
  def q39TopkAggregator(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val topk = udaf(new TopK(3))
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(topk(col("c_acctbal"), col("c_custkey")).as("top"))
      .select(col("c_nationkey"), posexplode(col("top")).as(Seq("i", "kv")))
      .select(col("c_nationkey"), (col("i") + 1).cast("long").as("rank"),
        col("kv.id").as("c_custkey"), col("kv.v").as("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rank"))
  }

  val q39Sql: String =
    """SELECT c_nationkey, rank, c_custkey, c_acctbal FROM (
         SELECT c_nationkey, c_custkey, c_acctbal,
                CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                     ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rank
         FROM customer)
       WHERE rank <= 3 ORDER BY c_nationkey, rank"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q19_stats" -> (q19Stats _),
    "q27_percentiles" -> (q27Percentiles _),
    "q28_string_agg" -> (q28StringAgg _),
    "q29_map_funcs" -> (q29MapFuncs _),
    "q39_topk_aggregator" -> (q39TopkAggregator _))

  val oracle: Map[String, String] = Map(
    "q19_stats" -> q19Sql,
    "q27_percentiles" -> q27Sql,
    "q28_string_agg" -> q28Sql,
    "q29_map_funcs" -> q29Sql,
    "q39_topk_aggregator" -> q39Sql)
}
