package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Scalar function families (string / date / math / JSON / array / regexp).
  * The reference's entire scalar surface is `toLowerCase` + an ISO timestamp
  * format (Hashtag.scala:12, SparkApplication.scala:122); this is the
  * generalization. All expressions are Catalyst built-ins → whole-stage
  * codegen, no UDFs in any hot path.
  *
  * Oracle parity notes: DuckDB `dayofweek` is Sunday=0 vs Spark Sunday=1
  * (adjusted below); math results that depend on libm (ln/exp/sqrt) are
  * rounded to 6 decimals before compare.
  */
object Scalars {

  /** String function family over part names. */
  def q30StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 8).as("name_head"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("name_starred"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_padded"),
        reverse(col("p_brand")).as("brand_rev"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        when(col("p_name").contains("green"), lit(1L)).otherwise(lit(0L)).as("has_green"))
      .orderBy(col("p_partkey"))

  val q30Sql: String =
    """SELECT p_partkey,
              UPPER(p_name) AS name_upper,
              CAST(LENGTH(p_name) AS BIGINT) AS name_len,
              SUBSTRING(p_name, 1, 8) AS name_head,
              REGEXP_REPLACE(p_name, '[aeiou]', '*', 'g') AS name_starred,
              CONCAT_WS('|', p_brand, p_type) AS brand_type,
              LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
              REVERSE(p_brand) AS brand_rev,
              CAST(LENGTH(string_split(p_name, ' ')) AS BIGINT) AS n_words,
              CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green
       FROM part ORDER BY p_partkey"""

  /** Date/time function family over orders. dayofweek normalized to the
    * ISO-agnostic Sunday=0 convention shared with DuckDB.
    */
  def q31DateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        (dayofweek(col("o_orderdate")) - 1).as("dow"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        date_add(to_date(col("o_orderdate")), 30).as("due_date"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))).cast("long").as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  val q31Sql: String =
    """SELECT o_orderkey,
              CAST(YEAR(o_orderdate) AS INT) AS yr,
              CAST(MONTH(o_orderdate) AS INT) AS mo,
              CAST(DAY(o_orderdate) AS INT) AS dom,
              CAST(QUARTER(o_orderdate) AS INT) AS qtr,
              CAST(DAYOFWEEK(o_orderdate) AS INT) AS dow,
              CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
              LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
              CAST(o_orderdate AS DATE) + 30 AS due_date,
              DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
       FROM orders ORDER BY o_orderkey"""

  /** Math function family. libm-dependent results (sqrt/ln/exp/pow) are
    * rounded to 6 decimals so last-ULP differences between JVM and C libm
    * cannot flip the hash compare.
    */
  def q32MathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        round(col("l_extendedprice"), -2).as("price_100s"),
        floor(col("l_extendedprice")).cast("double").as("price_floor"),
        ceil(col("l_extendedprice")).cast("double").as("price_ceil"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod7"),
        signum(col("l_discount") - 0.05).as("disc_sign"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q32Sql: String =
    """SELECT l_orderkey, l_linenumber,
              ABS(l_quantity - 25) AS qty_dev,
              ROUND(l_extendedprice, -2) AS price_100s,
              CAST(FLOOR(l_extendedprice) AS DOUBLE) AS price_floor,
              CAST(CEIL(l_extendedprice) AS DOUBLE) AS price_ceil,
              ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
              ROUND(LN(l_extendedprice), 6) AS price_ln,
              l_orderkey % 7 AS key_mod7,
              CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign
       FROM lineitem WHERE l_orderkey < 500
       ORDER BY l_orderkey, l_linenumber"""

  /** JSON extraction from the events.props string column (schema-on-read,
    * the moral successor of the reference's org.json navigation at
    * SparkApplication.scala:66-74). get_json_object pushes nothing to the
    * scan but is codegen'd; at 100 TB prefer parsing once via from_json
    * into a struct column and pruning.
    */
  def q33JsonFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .groupBy((col("k_val") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k_val")).as("sum_k"))
      .orderBy(col("k_bucket").asc_nulls_first)

  /** NULLS FIRST pinned: Spark defaults ASC NULLS FIRST, DuckDB NULLS
    * LAST — a props row without $.k would otherwise order differently.
    */
  val q33Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
              COUNT(*) AS n,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
       FROM events GROUP BY 1 ORDER BY k_bucket NULLS FIRST"""

  /** Semi-structured navigation via Spark 4's VARIANT type: parse_json
    * once into the binary-encoded variant, then typed variant_get
    * extraction — the at-scale successor to both q33's per-field
    * get_json_object (re-parses per field) and q67's from_json (needs the
    * schema up front). Variant keeps schema-on-read AND single-parse;
    * at 100 TB it's the difference between N regex-ish scans of the JSON
    * string and one binary decode. Same aggregate shape as q33 so the
    * engines' answers are directly comparable.
    */
  def q82VariantJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k_val"))
      .groupBy((col("k_val") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k_val")).as("sum_k"))
      .orderBy(col("k_bucket").asc_nulls_first)

  val q82Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
              COUNT(*) AS n,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
       FROM events GROUP BY 1 ORDER BY k_bucket NULLS FIRST"""

  /** Array functions over tokenized documents: build the token array once,
    * then slice/contain/dedup-sort — all higher-order/array built-ins.
    */
  def q34ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        array_contains(col("toks"), "spark").as("has_spark"),
        concat_ws(" ", slice(col("toks"), 1, 3)).as("head3"),
        concat_ws(" ", slice(sort_array(array_distinct(col("toks"))), 1, 5)).as("sig5"))
      .orderBy(col("doc_id"))

  val q34Sql: String =
    """SELECT doc_id,
              CAST(LENGTH(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              CAST(LENGTH(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
              list_contains(string_split(text, ' '), 'spark') AS has_spark,
              array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS head3,
              array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5), ' ') AS sig5
       FROM documents ORDER BY doc_id"""

  /** Generator (UDTF-equivalent): explode tokens → global top-20 terms.
    * This is the reference's flatMap-to-hashtags shape
    * (SparkApplication.scala:66-85) applied to documents: explode, count,
    * top-k with deterministic tiebreak.
    */
  def q35ExplodeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(20)

  val q35Sql: String =
    """SELECT token, COUNT(*) AS n
       FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
       GROUP BY token ORDER BY n DESC, token ASC LIMIT 20"""

  /** Conditional/null-handling family: CASE WHEN, NULLIF, COALESCE, IN. */
  def q36Conditionals(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_class"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("(machinery)")).as("seg_masked"),
        col("c_nationkey").isin(1, 2, 3).as("in_nations"))
      .orderBy(col("c_custkey"))

  val q36Sql: String =
    """SELECT c_custkey,
              CASE WHEN c_acctbal < 0 THEN 'debt'
                   WHEN c_acctbal < 5000 THEN 'low'
                   ELSE 'high' END AS bal_class,
              COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), '(machinery)') AS seg_masked,
              c_nationkey IN (1, 2, 3) AS in_nations
       FROM customer ORDER BY c_custkey"""

  /** inline() generator as an unpivot: one row per (event kind, date) from
    * an inline-built array<struct> — the generator dual of explode for
    * struct rows (SURVEY.md §2.2 UDTF row).
    */
  def q66InlineUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") <= 1000)
      .select(col("o_orderkey"), expr(
        """inline(array(
             struct('ordered' AS kind, CAST(o_orderdate AS DATE) AS d),
             struct('due30' AS kind, CAST(o_orderdate AS DATE) + 30 AS d)))"""))
      .orderBy(col("o_orderkey"), col("kind"))

  val q66Sql: String =
    """SELECT o_orderkey, kind, d FROM (
         SELECT o_orderkey, 'ordered' AS kind, CAST(o_orderdate AS DATE) AS d
         FROM orders WHERE o_orderkey <= 1000
         UNION ALL
         SELECT o_orderkey, 'due30' AS kind, CAST(o_orderdate AS DATE) + 30 AS d
         FROM orders WHERE o_orderkey <= 1000)
       ORDER BY o_orderkey, kind"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q66_inline_unpivot" -> (q66InlineUnpivot _),
    "q30_string_funcs" -> (q30StringFuncs _),
    "q31_date_funcs" -> (q31DateFuncs _),
    "q32_math_funcs" -> (q32MathFuncs _),
    "q33_json_funcs" -> (q33JsonFuncs _),
    "q34_array_funcs" -> (q34ArrayFuncs _),
    "q35_explode_tokens" -> (q35ExplodeTokens _),
    "q36_conditionals" -> (q36Conditionals _),
    "q82_variant_json" -> (q82VariantJson _))

  val oracle: Map[String, String] = Map(
    "q66_inline_unpivot" -> q66Sql,
    "q30_string_funcs" -> q30Sql,
    "q31_date_funcs" -> q31Sql,
    "q32_math_funcs" -> q32Sql,
    "q33_json_funcs" -> q33Sql,
    "q34_array_funcs" -> q34Sql,
    "q35_explode_tokens" -> q35Sql,
    "q36_conditionals" -> q36Sql,
    "q82_variant_json" -> q82Sql)
}
