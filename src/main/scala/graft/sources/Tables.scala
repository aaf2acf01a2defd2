package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * Scale notes: each table is a single parquet file locally, but the loaders
  * take a directory so a 100 TB deployment can point the same code at a
  * partitioned parquet dataset (directory of files) unchanged —
  * `spark.read.parquet` handles both. Column pruning and predicate pushdown
  * are left to Catalyst; callers must select/filter declaratively so the
  * pushdown reaches the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` arrives in whatever timestamp encoding the data
    * generator's arrow version emitted — TIMESTAMP(NANOS) (which Spark's
    * vectorized reader only reads via the nanosAsLong legacy flag, as a
    * long), TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ),
    * or plain TIMESTAMP. Normalize all three to a microsecond
    * TimestampType column so downstream operators see one type; the
    * session timezone is UTC everywhere (SparkEntry builders + specs), so
    * the NTZ→LTZ cast is a wall-clock identity, and the nanos→micros
    * division is exact integer arithmetic. The scan still prunes/pushes
    * on other columns.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported parquet type $other")
    }
  }

  /** Register every table as a temp view (idempotent) so SQL-front-end
    * queries (grouping sets, subqueries) can run against the same data the
    * DataFrame queries use. Returns the session for chaining.
    */
  def registerViews(spark: SparkSession, dir: String): SparkSession = {
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark
  }
}
