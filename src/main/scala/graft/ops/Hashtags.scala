package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Driver-checkable batch parity for the tweet/hashtag pipeline
  * (streaming.TweetPipeline — the reference's whole dataflow,
  * SparkApplication.scala:57-95). Tweets are synthesized deterministically
  * from `documents`: each doc's first 5 tokens become its hashtags, and
  * every 97th doc emits a malformed line (which the PERMISSIVE parse must
  * swallow — the reference would crash the task, SparkApplication.scala:67).
  * The JSON detour (to_json-shaped string → from_json → explode) is the
  * point: it proves the parse/flatten/filter/count/top-k chain end-to-end,
  * while the oracle computes the same counts straight from the tokens.
  */
object Hashtags {

  def q37HashtagTopk(s: SparkSession, dir: String): DataFrame = {
    // Tokens restricted to JSON-safe word characters in BOTH engines —
    // raw concatenation would otherwise build invalid JSON for a token
    // containing a quote/backslash, silently dropping that doc's tags in
    // Spark while the oracle still counted them.
    val tweets = t(s, dir, "documents")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(97)) === 0, lit("{not json!"))
          .otherwise(concat(lit("""{"entities":{"hashtags":["""),
            concat_ws(",", expr(
              """transform(
                   filter(slice(split(text, ' '), 1, 5), t -> t rlike '^[A-Za-z0-9_]+$'),
                   t -> concat('{"text":"', t, '"}'))""")),
            lit("]}}"))).as("value"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))
    graft.streaming.TweetPipeline.batchTop5(tweets, 10)
      .select(col("hashtag"), col("count"))
  }

  /** Mirrors TweetPipeline.countTags exactly: case-insensitive key,
    * min(tag) display casing, count-desc/tag-asc top-k.
    */
  val q37Sql: String =
    """SELECT MIN(tag) AS hashtag, COUNT(*) AS count
       FROM (SELECT unnest(string_split(text, ' ')[1:5]) AS tag
             FROM documents WHERE doc_id % 97 <> 0)
       WHERE lower(tag) NOT IN ('europe', 'europa', 'eu', 'euro')
         AND regexp_full_match(tag, '[A-Za-z0-9_]+')
       GROUP BY lower(tag) ORDER BY count DESC, hashtag ASC LIMIT 10"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_hashtag_topk" -> (q37HashtagTopk _))

  val oracle: Map[String, String] = Map(
    "q37_hashtag_topk" -> q37Sql)
}
