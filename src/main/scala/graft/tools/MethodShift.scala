package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off methodology probe for the round-7 bench change (VERDICT r6
  * item 2): times each selected query BOTH ways — the old `count()`
  * (which lets EliminateSorts drop terminal presentation sorts) and the
  * new noop-format write (full plan) — in the same JVM, min-of-3 each,
  * so BASELINE.md can record the expected level shift as a measurement
  * instead of a guess. Usage mirrors Bench env vars
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_ONLY / SPARK_GRAFT_CPUS).
  */
object MethodShift {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.forall(f => f.contains(name) || f.contains(name.takeWhile(_ != '_'))) }
    def m3(f: => Unit): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.StorageHandle.releaseDefaults(); spark.catalog.clearCache(); dt
    }.min
    var sumC = 0.0; var sumN = 0.0
    selected.foreach { case (name, fn) =>
      val c = m3(fn(spark, sfDir).count())
      val n = m3(fn(spark, sfDir).write.mode("overwrite").format("noop").save())
      System.gc()
      sumC += c; sumN += n
      println(f"$name%-34s count=$c%7.3f noop=$n%7.3f shift=${n / c}%5.2fx")
    }
    println(f"TOTAL count=$sumC%.2f noop=$sumN%.2f shift=${sumN / sumC}%.3fx")
    spark.stop()
  }
}
