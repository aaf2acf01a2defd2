package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT/codegen/session init otherwise lands entirely on
    // whichever query the Map iterates first (observed ~4s skew).
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Three timed executions per query, report the min: steady-state cost,
    // robust to shared-machine noise (runs on this box show ±20-40% ambient
    // variance; round 2's driver bench recorded 2-4× outliers on queries
    // that re-measured clean, so buy extra noise immunity here).
    // Optional subset filter for scaling probes (e.g. the BASELINE.md sf1
    // runs, which replicate only documents/embeddings); unset = full suite,
    // which is what the driver runs. Entries match a full query name OR its
    // qNN prefix (the keys this main itself prints), and unmatched entries
    // warn loudly — a typo'd filter must not record an empty suite as a
    // legitimate 0-second measurement.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { filters =>
      val known = SparkEntry.queries.keySet
      val unmatched = filters.filterNot(f =>
        known.contains(f) || known.exists(_.takeWhile(_ != '_') == f))
      if (unmatched.nonEmpty)
        System.err.println(s"[bench] SPARK_GRAFT_ONLY entries match no query: " +
          unmatched.mkString(", "))
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.forall(f => f.contains(name) || f.contains(name.takeWhile(_ != '_'))) }
    // An all-typo filter must fail loudly, not record an empty suite as a
    // legitimate 0-second total a downstream parser would trust (ADVICE r4).
    if (only.isDefined && selected.isEmpty) {
      System.err.println(s"[bench] SPARK_GRAFT_ONLY matched zero queries: " +
        only.get.mkString(", "))
      spark.stop()
      sys.exit(2)
    }
    // Machine-speed anchor: a fixed DATA-INDEPENDENT workload (hash-sum
    // over a generated range — no I/O, no testdata dependency) timed the
    // same min-of-three way. Cross-round comparisons divide query times by
    // the anchor ratio to cancel the ±20-40% ambient machine variance this
    // box shows, instead of caveating it in prose (VERDICT r4 item 8).
    val anchor = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      // % bounds the summand so the 20M-row sum stays ANSI-safe (a raw
      // xxhash64 sum overflows LONG and throws under Spark 4's ANSI mode).
      spark.range(20000000L).selectExpr("sum(xxhash64(id) % 1000000)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val results = selected
      .map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            // Surface loudly: a bench-only failure (sf0.1) would otherwise
            // hide behind a normal-looking timing.
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // Per-query caches must not leak across timings; releaseDefaults
        // also frees localCheckpoint blocks clearCache can't see.
        ops.StorageHandle.releaseDefaults()
        spark.catalog.clearCache()
        dt
      }
      name -> times.min
    }.toMap
    // The driver's stdout capture is bounded (~2.5 KB observed: round 3's
    // 85-query line lost its last 7 entries). Two size controls keep the
    // whole line inside it at 95+ queries: 3-decimal rounding, and keys
    // shortened to the unambiguous "qNN" prefix (full names live in
    // SparkEntry.queries / BASELINE.md).
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val shortKeys = results.keys.map(_.takeWhile(_ != '_')).toSeq
    require(shortKeys.distinct.size == shortKeys.size,
      "qNN prefixes must stay unique — a collision would emit duplicate JSON keys: " +
        shortKeys.diff(shortKeys.distinct).mkString(", "))
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k.takeWhile(_ != '_') + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","anchor":${r3(anchor)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
