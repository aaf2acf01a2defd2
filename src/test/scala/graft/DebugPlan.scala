package graft

import org.apache.spark.sql.SparkSession

object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.collect()
    println("=== EXECUTED ===")
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.toString)
    spark.stop()
  }
}
