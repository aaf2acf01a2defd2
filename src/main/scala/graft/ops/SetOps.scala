package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Set operations + subquery forms (SURVEY.md §2.2: absent from the
  * reference, part of the rebuild's general surface).
  *
  * Scale notes: Spark's `union` is UNION ALL (no shuffle — just plan
  * concatenation); INTERSECT/EXCEPT plan as left-semi/anti joins over
  * distinct inputs, i.e. one shuffle each on the compared columns.
  * Subqueries decorrelate into joins via Catalyst's RewritePredicateSubquery
  * — the scalar subquery is a one-row broadcast.
  */
object SetOps {

  /** UNION ALL with provenance tag (Spark union == SQL UNION ALL). */
  def q40Union(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_nationkey").cast("int").as("nationkey"), lit("customer").as("side"))
    val p = t(s, dir, "supplier")
      .select(col("s_nationkey").cast("int").as("nationkey"), lit("supplier").as("side"))
    c.union(p)
      .groupBy(col("nationkey"), col("side"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"), col("side"))
  }

  val q40Sql: String =
    """SELECT nationkey, side, COUNT(*) AS n FROM (
         SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
         UNION ALL
         SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier)
       GROUP BY nationkey, side ORDER BY nationkey, side"""

  /** INTERSECT: nations having both customers and suppliers. */
  def q41Intersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey")))
      .orderBy(col("nationkey"))

  val q41Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
       INTERSECT
       SELECT s_nationkey AS nationkey FROM supplier
       ORDER BY nationkey"""

  /** EXCEPT: nations with customers but no suppliers. */
  def q42Except(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey")))
      .orderBy(col("nationkey"))

  val q42Sql: String =
    """SELECT c_nationkey AS nationkey FROM customer
       EXCEPT
       SELECT s_nationkey AS nationkey FROM supplier
       ORDER BY nationkey"""

  /** Scalar subquery: orders above the global average price, counted per
    * status. The average is computed as exact-decimal-sum / count so both
    * engines compare against the bit-identical threshold.
    */
  def q43ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.registerViews(s, dir)
    s.sql(
      """SELECT o_orderstatus, COUNT(*) AS n_above
         FROM orders
         WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  val q43Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_above
       FROM orders
       WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders)
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** IN subquery (decorrelates to a left-semi join). */
  def q44InSubquery(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.registerViews(s, dir)
    s.sql(
      """SELECT p_brand, COUNT(*) AS n_parts
         FROM part
         WHERE p_partkey IN (
           SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderpriority = '1-URGENT')
         GROUP BY p_brand ORDER BY p_brand""")
  }

  val q44Sql: String =
    """SELECT p_brand, COUNT(*) AS n_parts
       FROM part
       WHERE p_partkey IN (
         SELECT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT')
       GROUP BY p_brand ORDER BY p_brand"""

  /** Correlated EXISTS with an inner predicate (decorrelates to semi join
    * with the filter pushed below the join).
    */
  def q45CorrelatedExists(s: SparkSession, dir: String): DataFrame = {
    graft.sources.Tables.registerViews(s, dir)
    s.sql(
      """SELECT s_suppkey, s_name
         FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_suppkey = s_suppkey AND l_quantity = 50)
         ORDER BY s_suppkey""")
  }

  val q45Sql: String =
    """SELECT s_suppkey, s_name
       FROM supplier
       WHERE EXISTS (SELECT 1 FROM lineitem
                     WHERE l_suppkey = s_suppkey AND l_quantity = 50)
       ORDER BY s_suppkey"""

  /** INTERSECT ALL / EXCEPT ALL — multiset semantics (kept distinct from
    * q41/q42's set semantics; Spark plans these with a row-number-over-
    * count rewrite, one shuffle each).
    */
  def q68IntersectAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
      .intersectAll(t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  val q68Sql: String =
    """SELECT nationkey, COUNT(*) AS n FROM (
         SELECT c_nationkey AS nationkey FROM customer
         INTERSECT ALL
         SELECT s_nationkey AS nationkey FROM supplier)
       GROUP BY nationkey ORDER BY nationkey"""

  def q69ExceptAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
      .exceptAll(t(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))

  val q69Sql: String =
    """SELECT nationkey, COUNT(*) AS n FROM (
         SELECT c_nationkey AS nationkey FROM customer
         EXCEPT ALL
         SELECT s_nationkey AS nationkey FROM supplier)
       GROUP BY nationkey ORDER BY nationkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_intersect_all" -> (q68IntersectAll _),
    "q69_except_all" -> (q69ExceptAll _),
    "q40_union" -> (q40Union _),
    "q41_intersect" -> (q41Intersect _),
    "q42_except" -> (q42Except _),
    "q43_scalar_subquery" -> (q43ScalarSubquery _),
    "q44_in_subquery" -> (q44InSubquery _),
    "q45_correlated_exists" -> (q45CorrelatedExists _))

  val oracle: Map[String, String] = Map(
    "q68_intersect_all" -> q68Sql,
    "q69_except_all" -> q69Sql,
    "q40_union" -> q40Sql,
    "q41_intersect" -> q41Sql,
    "q42_except" -> q42Sql,
    "q43_scalar_subquery" -> q43Sql,
    "q44_in_subquery" -> q44Sql,
    "q45_correlated_exists" -> q45Sql)
}
