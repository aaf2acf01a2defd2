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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a long via the
    * legacy flag and rebuild a microsecond TimestampType column (integer
    * nanos→micros division — exact, no FP). Downstream operators see a
    * normal timestamp; the scan still prunes/pushes on other columns.
    */
  private def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
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
