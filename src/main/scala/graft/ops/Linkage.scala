package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Record-linkage operators: approximate (edit-distance) joins with
  * lossless blocking — the entity-resolution shape Spark has no native
  * operator for, composed from built-ins so Catalyst still owns the plan.
  */
object Linkage {

  /** Fuzzy self-join on part names (edit distance ≤ 4) — the standard
    * dictionary-first entity-resolution pipeline:
    *
    *  1. Dedupe the fact table to its DISTINCT name dictionary (64 names
    *     back 2,000 parts here; at 100 TB the dictionary is orders of
    *     magnitude smaller than the fact table — the quadratic stage never
    *     touches fact rows).
    *  2. Length-band block the dictionary: bucket = len DIV 5. Bucket
    *     width 5 > max distance 4 guarantees |len(a) − len(b)| ≤ 4 ⟹
    *     |bucket(a) − bucket(b)| ≤ 1, so emitting each left name under
    *     {b−1, b, b+1} and joining on the single right bucket is LOSSLESS
    *     blocking — and exactly-once per pair, because the three emitted
    *     keys are distinct and the right side carries one key.
    *  3. Cheap length filter, then the expensive levenshtein verify, only
    *     on blocked candidates (codegen'd — Spark's levenshtein and
    *     DuckDB's agree on the classic unit-cost edit distance).
    *  4. Map back: per-name part counts ride along from step 1.
    *
    * Scale shape: one dictionary aggregation (partial-aggregated), a 3×
    * dictionary-sized band join, no fact-table self-join anywhere.
    */
  def q108FuzzyNameJoin(s: SparkSession, dir: String): DataFrame = {
    val K = 4
    val names = t(s, dir, "part")
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("b", expr("length(p_name) DIV 5"))
    val left = names.select(col("p_name").as("name1"),
      col("n_parts").as("n_parts1"),
      explode(expr("array(b - 1, b, b + 1)")).as("bk"))
    val right = names.select(col("p_name").as("name2"),
      col("n_parts").as("n_parts2"), col("b").as("bk"))
    left.join(right, Seq("bk"))
      .filter(col("name1") < col("name2"))
      .filter(abs(length(col("name1")) - length(col("name2"))) <= K)
      .withColumn("dist", levenshtein(col("name1"), col("name2")))
      .filter(col("dist") <= K)
      .select(col("name1"), col("name2"), col("dist"),
        col("n_parts1"), col("n_parts2"))
      .orderBy(col("name1"), col("name2"))
  }

  /** Oracle: blocking is lossless, so the reference formulation skips it —
    * plain dictionary cross-filter with the same length prune, distance
    * bound, and canonical name1 < name2 orientation.
    */
  val q108Sql: String =
    """WITH names AS (SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name)
       SELECT a.p_name AS name1, b.p_name AS name2,
              levenshtein(a.p_name, b.p_name) AS dist,
              a.n_parts AS n_parts1, b.n_parts AS n_parts2
       FROM names a JOIN names b
         ON a.p_name < b.p_name
        AND abs(length(a.p_name) - length(b.p_name)) <= 4
        AND levenshtein(a.p_name, b.p_name) <= 4
       ORDER BY name1, name2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_fuzzy_name_join" -> (q108FuzzyNameJoin _))

  val oracle: Map[String, String] = Map(
    "q108_fuzzy_name_join" -> q108Sql)
}
