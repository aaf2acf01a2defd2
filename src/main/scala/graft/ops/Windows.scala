package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Window-function surface. The reference's only "window" is a global
  * sort+take(5) per batch (SparkApplication.scala:90-93); the per-group
  * top-k below (q20) is its generalization, and the rest covers ranking,
  * analytic (lag/lead), and running/moving frames per SURVEY.md §2.2.
  *
  * Scale notes: window functions shuffle once on partitionBy keys and sort
  * within partitions. The skew risk is a hot partition key; these queries
  * partition on nation/customer/user keys whose cardinality grows with the
  * data, so partitions stay bounded. Per-group top-k via row_number +
  * filter ≤ k lets Spark's WindowGroupLimit pushdown (rank-limit
  * optimization) drop rows early rather than fully sorting each partition.
  * Every ORDER BY inside a window carries a unique tiebreak column so
  * results are deterministic and oracle-comparable.
  */
object Windows {

  /** Ranking trio + per-group top-3 (the generalized top-5-hashtags). */
  def q20WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  val q20Sql: String =
    """SELECT * FROM (
         SELECT c_nationkey, c_custkey, c_acctbal,
                ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
       ) WHERE rn <= 3 ORDER BY c_nationkey, rn"""

  /** Running (cumulative) sum + lag/lead over each customer's order history.
    * The running sum accumulates exact decimals and converts to DOUBLE per
    * row — order-independent across engines because the frame order is
    * total (date, orderkey).
    */
  def q21WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)").as("running_total"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        row_number().over(w).as("order_seq"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  val q21Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
              LAG(o_totalprice, 1) OVER w AS prev_price,
              LEAD(o_totalprice, 1) OVER w AS next_price,
              ROW_NUMBER() OVER w AS order_seq
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
       ORDER BY o_custkey, order_seq"""

  /** Moving 30-day sum via a numeric RANGE frame over epoch-day — the
    * portable form of RANGE BETWEEN INTERVAL. One shuffle on user key;
    * the range frame is evaluated with a sliding pointer, not a rescan.
    */
  def q22WindowMoving(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("epoch_day", datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY epoch_day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)").as("sum_30d"),
        expr("COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)").as("n_30d"))
      .orderBy(col("o_custkey"), col("epoch_day"), col("o_orderkey"))

  val q22Sql: String =
    """SELECT o_custkey, o_orderkey,
              DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_30d,
              COUNT(*) OVER w AS n_30d
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey
                    ORDER BY DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
       ORDER BY o_custkey, epoch_day, o_orderkey"""

  /** Share-of-partition analytic: each order's fraction of its customer's
    * lifetime spend. Numerator and denominator are both exact-decimal
    * sums cast to DOUBLE, so the single FP division matches DuckDB.
    */
  def q23WindowShare(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("""CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) /
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)""").as("share"))
      .orderBy(col("o_custkey"), col("o_orderkey"))

  val q23Sql: String =
    """SELECT o_custkey, o_orderkey,
              CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) /
              CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey) AS DOUBLE) AS share
       FROM orders ORDER BY o_custkey, o_orderkey"""

  /** Global top-10: plans as TakeOrderedAndProject (per-partition heaps,
    * no total sort) — the scalable form of the reference's
    * sortByKey+take(5) (SparkApplication.scala:90-93).
    */
  def q24TopkGlobal(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  val q24Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""

  /** NTILE quartiles by account balance within each market segment, then
    * per-bucket stats — window + reaggregation in one pipeline.
    */
  def q25Ntile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)").as("min_bal"),
        expr("CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)").as("max_bal"))
      .orderBy(col("c_mktsegment"), col("quartile"))
  }

  val q25Sql: String =
    """SELECT c_mktsegment, quartile, COUNT(*) AS n,
              CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
              CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
       FROM (SELECT c_mktsegment, c_acctbal,
                    NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
             FROM customer)
       GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile"""

  /** first/last value over an explicit frame: each nation's poorest and
    * richest customer name, evaluated with a full-partition frame.
    */
  def q26FirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "customer")
      .select(col("c_nationkey"),
        first(col("c_name")).over(w).as("poorest"),
        last(col("c_name")).over(w).as("richest"))
      .distinct()
      .orderBy(col("c_nationkey"))
  }

  val q26Sql: String =
    """SELECT DISTINCT c_nationkey,
              FIRST_VALUE(c_name) OVER w AS poorest,
              LAST_VALUE(c_name) OVER w AS richest
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY c_nationkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_window_rank" -> (q20WindowRank _),
    "q21_window_running" -> (q21WindowRunning _),
    "q22_window_moving" -> (q22WindowMoving _),
    "q23_window_share" -> (q23WindowShare _),
    "q24_topk_global" -> (q24TopkGlobal _),
    "q25_ntile" -> (q25Ntile _),
    "q26_first_last" -> (q26FirstLast _))

  val oracle: Map[String, String] = Map(
    "q20_window_rank" -> q20Sql,
    "q21_window_running" -> q21Sql,
    "q22_window_moving" -> q22Sql,
    "q23_window_share" -> q23Sql,
    "q24_topk_global" -> q24Sql,
    "q25_ntile" -> q25Sql,
    "q26_first_last" -> q26Sql)
}
