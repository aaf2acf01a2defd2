package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Skew mitigation (SURVEY.md "Partitioning & shuffle" mandate): manual
  * salting, for engines/paths where AQE's runtime skew-join split doesn't
  * apply (e.g. aggregations over a hot key, or pre-Spark-3 style static
  * plans). The oracle proves the salted formulation computes *exactly*
  * the plain join+aggregate result — salting changes the partitioning,
  * never the semantics.
  */
object Skew {

  /** Salted fact-dim join + two-phase aggregation, salt factor 8:
    *   - fact side: deterministic salt from the row identity spreads one
    *     hot join/group key over 8 reducer partitions;
    *   - dim side: exploded ×8 so every (key, salt) replica can match;
    *   - aggregation: partial per (key, salt), then final per key — the
    *     partial shuffle carries 8 small rows per key instead of one huge
    *     partition.
    * At 100 TB this is the standard counter to a power-law supplier/user
    * key; AQE skew-join handles the join side at runtime, but the salted
    * two-phase aggregate is still the only fix for a skewed groupBy.
    */
  def q57SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val R = 8
    val fact = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(R)))
    val dim = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
      .withColumn("salt", explode(sequence(lit(0L), lit(R - 1L))))
    val partial = fact
      .join(dim, col("l_suppkey") === col("s_suppkey") && fact("salt") === dim("salt"))
      .groupBy(col("s_suppkey"), col("s_name"), dim("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(12,2))")).as("psum"))
    partial
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(sum(col("pn")).as("n_items"),
        expr("CAST(SUM(psum) AS DOUBLE)").as("revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q57Sql: String =
    """SELECT s_suppkey, s_name, COUNT(*) AS n_items,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY s_suppkey, s_name ORDER BY s_suppkey"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_salted_join" -> (q57SaltedJoin _))

  val oracle: Map[String, String] = Map(
    "q57_salted_join" -> q57Sql)
}
