package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Relational operator library: scans, filters, joins, aggregations.
  *
  * The reference (kubahorak/mrtweety-analytic) implements only projection,
  * filter, windowed count, sort and top-k (SparkApplication.scala:57-95); the
  * full relational surface below is the rebuild's generalization per
  * SURVEY.md §2.2, expressed declaratively so Catalyst handles pushdown,
  * pruning, join selection and partial aggregation.
  *
  * Oracle-parity discipline (driver hash-compares against DuckDB):
  *   - money/double aggregates: cast inputs to DECIMAL before SUM (exact,
  *     order-independent), cast the final value to DOUBLE → bit-identical
  *     results in both engines regardless of partition/summation order.
  *   - averages: exact decimal SUM cast to DOUBLE, divided by COUNT — one
  *     FP op on identical operands in both engines.
  *   - every query ends in a deterministic ORDER BY over a unique key.
  *
  * Scale notes per query are on each def.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. Partial+final HashAggregate; the only
    * shuffle is 4-group-wide. Filter and 7-column pruning reach the parquet
    * scan. Scales linearly; no skew risk (6 distinct flag/status pairs →
    * partial aggregation collapses everything map-side).
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").as("sum_base_price"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)").as("sum_disc_price"),
        expr("SUM(l_quantity) / COUNT(*)").as("avg_qty"),
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)").as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** Pure scan→filter→project: verifies predicate pushdown + column pruning
    * (PushedFilters + 4-col ReadSchema in the plan). No shuffle except the
    * final sort. At 100 TB this is an embarrassingly parallel scan whose
    * cost is bounded by the pushed predicates' selectivity.
    */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 48 && col("l_returnflag") === "R" &&
        to_date(col("l_shipdate")).between(lit("1997-01-01").cast("date"), lit("1997-12-31").cast("date")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_quantity >= 48 AND l_returnflag = 'R'
         AND CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
       ORDER BY l_orderkey, l_linenumber"""

  /** TPC-H Q6-style single-row global aggregate: fully map-side partial agg,
    * one-row shuffle. The selective predicates push to the scan.
    */
  def q03Revenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")).between(lit("1996-01-01").cast("date"), lit("1996-12-31").cast("date")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)").as("revenue"),
        count(lit(1)).as("n_items"))

  val q03Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  /** Star-schema join: customer ⋈ nation ⋈ region with explicit broadcast of
    * the two tiny dims → two BroadcastHashJoins, zero shuffle before the
    * 5-group aggregate. This is the canonical 100 TB shape: fact stays
    * partitioned, dims ship to every executor.
    */
  def q04JoinBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        expr("CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)").as("total_bal"))
      .orderBy(col("r_name"))

  val q04Sql: String =
    """SELECT r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name"""

  /** Three-way fact-to-fact join: lineitem ⋈ orders (both large → sort-merge
    * or shuffled-hash on the shared key) then ⋈ broadcast(customer-dim
    * projection). Revenue per market segment per year. At 100 TB, lineitem
    * and orders co-partition on orderkey (bucketing would eliminate the
    * shuffle entirely); customer projected to 2 columns before broadcast.
    */
  def q05JoinMultiway(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), year(col("o_orderdate")).as("o_year"))
      .agg(expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)").as("revenue"))
      .orderBy(col("c_mktsegment"), col("o_year"))
  }

  val q05Sql: String =
    """SELECT c_mktsegment, YEAR(o_orderdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment, YEAR(o_orderdate)
       ORDER BY c_mktsegment, o_year"""

  /** Left outer join preserving customers with zero orders, then per-customer
    * rollup. Output is dimension-sized (one row per customer), so safe to
    * materialize at any scale where `customer` itself is manageable.
    */
  def q06JoinLeft(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        expr("CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), CAST(0 AS DECIMAL(12,2))) AS DOUBLE)").as("total_spent"))
      .orderBy(col("c_custkey"))

  val q06Sql: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey ORDER BY c_custkey"""

  /** Left-semi join (EXISTS): customers with at least one big order. The
    * semi-join only ships the distinct keys of the filtered right side —
    * at scale the orders side shrinks before the shuffle.
    */
  def q07JoinSemi(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000).select(col("o_custkey"))
    t(s, dir, "customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q07Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
       ORDER BY c_custkey"""

  /** Left-anti join (NOT EXISTS): customers with no order since 2001.
    * The right side is filtered *before* the anti join so only qualifying
    * keys shuffle.
    */
  def q08JoinAnti(s: SparkSession, dir: String): DataFrame = {
    val recent = t(s, dir, "orders")
      .filter(to_date(col("o_orderdate")) >= lit("2001-01-01").cast("date"))
      .select(col("o_custkey"))
    t(s, dir, "customer")
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q08Sql: String =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                         AND CAST(o_orderdate AS DATE) >= DATE '2001-01-01')
       ORDER BY c_custkey"""

  /** Full outer join of two pre-aggregated sides (customers/suppliers per
    * nation). Pre-aggregating before the join keeps the shuffled data
    * dimension-sized — the right order of operations at any scale.
    */
  def q09JoinFull(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val p = t(s, dir, "supplier").groupBy(col("s_nationkey").as("s_nk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(p, col("nationkey") === col("s_nk"), "full_outer")
      .select(
        coalesce(col("nationkey"), col("s_nk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q09Sql: String =
    """SELECT COALESCE(c.nationkey, p.s_nk) AS nationkey,
              COALESCE(c.n_cust, 0) AS n_cust, COALESCE(p.n_supp, 0) AS n_supp
       FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
       FULL OUTER JOIN (SELECT s_nationkey AS s_nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) p
       ON c.nationkey = p.s_nk
       ORDER BY nationkey"""

  /** Equi-join with a non-equi (range) residual: late shipments — lineitems
    * shipped >90 days after their order date. Planner uses the equi key for
    * the join (SMJ/SHJ) and evaluates the range predicate as a residual —
    * NOT a nested-loop join, so it scales like a normal key join.
    */
  def q10JoinRangeResidual(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey") &&
          to_date(col("l_shipdate")) > date_add(to_date(col("o_orderdate")), 90))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy(col("o_orderpriority"))

  val q10Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_late
       FROM lineitem JOIN orders
         ON l_orderkey = o_orderkey
        AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 90
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Pure range (band) join against a tiny inline dimension → broadcast
    * nested-loop join, which is the correct plan when the build side is a
    * handful of rows. At scale the fact side streams; each row probes 4
    * bands.
    */
  def q11JoinBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("p00_low", 0.0, 925.0),
      ("p01_mid", 925.0, 950.0),
      ("p02_high", 950.0, 975.0),
      ("p03_lux", 975.0, 1e9)).toDF("band", "lo", "hi")
    t(s, dir, "part")
      .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"),
        expr("CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)").as("sum_price"))
      .orderBy(col("band"))
  }

  val q11Sql: String =
    """SELECT band, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
       FROM part
       JOIN (VALUES ('p00_low', 0.0, 925.0), ('p01_mid', 925.0, 950.0),
                    ('p02_high', 950.0, 975.0), ('p03_lux', 975.0, 1e9)) AS bands(band, lo, hi)
         ON p_retailprice >= lo AND p_retailprice < hi
       GROUP BY band ORDER BY band"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_revenue" -> (q03Revenue _),
    "q04_join_broadcast" -> (q04JoinBroadcast _),
    "q05_join_multiway" -> (q05JoinMultiway _),
    "q06_join_left" -> (q06JoinLeft _),
    "q07_join_semi" -> (q07JoinSemi _),
    "q08_join_anti" -> (q08JoinAnti _),
    "q09_join_full" -> (q09JoinFull _),
    "q10_join_range_residual" -> (q10JoinRangeResidual _),
    "q11_join_bands" -> (q11JoinBands _))

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_revenue" -> q03Sql,
    "q04_join_broadcast" -> q04Sql,
    "q05_join_multiway" -> q05Sql,
    "q06_join_left" -> q06Sql,
    "q07_join_semi" -> q07Sql,
    "q08_join_anti" -> q08Sql,
    "q09_join_full" -> q09Sql,
    "q10_join_range_residual" -> q10Sql,
    "q11_join_bands" -> q11Sql)
}
