package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Sum of collection counts / ms across all collector beans. */
  private def gcTotals(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (beans.map(_.getCollectionCount).sum, beans.map(_.getCollectionTime).sum)
  }

  private def heapUsedMb(): Long = {
    val r = Runtime.getRuntime
    (r.totalMemory - r.freeMemory) / (1024L * 1024L)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // The status store retains per-execution/stage/task state even with
      // the UI off; at 136 queries x 3 runs the defaults (1000 executions,
      // 1000 stages) hold tens of thousands of plan graphs in driver heap
      // for queries that will never be inspected. Keep a short tail only.
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "500")
      // Belt-and-braces for the explicit per-query gc below: the context
      // cleaner's own fallback GC fires every 30 min by default — longer
      // than the whole suite, so without this broadcast/shuffle blocks
      // whose driver references died are never actually removed.
      .config("spark.cleaner.periodicGC.interval", "2min")
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
    // same min-of-N way. Cross-round comparisons divide query times by
    // the anchor ratio to cancel the ±20-40% ambient machine variance this
    // box shows, instead of caveating it in prose (VERDICT r4 item 8).
    def measureAnchor(n: Int): Double = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      // % bounds the summand so the 20M-row sum stays ANSI-safe (a raw
      // xxhash64 sum overflows LONG and throws under Spark 4's ANSI mode).
      spark.range(20000000L).selectExpr("sum(xxhash64(id) % 1000000)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val anchor = measureAnchor(3)
    // Round 5 post-mortem: the official 136-query run inflated 2-16× vs
    // isolated re-runs of the same queries on the same machine — cumulative
    // single-JVM state (broadcast blocks the ContextCleaner never reclaims
    // because the driver heap is big enough that GC never runs, status-store
    // growth), not the operators. Three countermeasures, all UNTIMED:
    //   1. a System.gc() after each query's timings, so dead broadcast/RDD
    //      references actually reach the cleaner's reference queue;
    //   2. the anchor re-measured every `anchorEvery` queries and emitted as
    //      "anchors": a flat series = ambient machine speed held AND the JVM
    //      stayed healthy; a rising series = cumulative degradation, making
    //      ambient-vs-cumulative decidable from the JSON line alone;
    //   3. per-query heap/GC deltas appended to a JSONL side file (stdout
    //      is bounded; full names + telemetry live in the file).
    val anchorEvery = 20
    val telemetryPath = sys.env.getOrElse(
      "SPARK_GRAFT_TELEMETRY", "target/bench_telemetry.jsonl")
    val telemetry = new StringBuilder
    val anchors = scala.collection.mutable.ArrayBuffer[Double]()
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val results = selected.zipWithIndex
      .map { case ((name, fn), qi) =>
      if (qi > 0 && qi % anchorEvery == 0) anchors += measureAnchor(2)
      val (gcN0, gcMs0) = gcTotals()
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
      // Untimed: give the ContextCleaner the GC it needs to find dead
      // broadcast/shuffle references before the next query piles more on.
      System.gc()
      val (gcN1, gcMs1) = gcTotals()
      telemetry ++= s"""{"q":"$name","sec":${r3(times.min)},"runs":[${times.map(r3).mkString(",")}],""" +
        s""""heap_mb":${heapUsedMb()},"gc_n":${gcN1 - gcN0},"gc_ms":${gcMs1 - gcMs0}}""" + "\n"
      name -> times.min
    }.toMap
    anchors += measureAnchor(2)
    try {
      val p = java.nio.file.Paths.get(telemetryPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, telemetry.toString.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] telemetry write failed: ${e.getMessage}")
    }
    // The driver's stdout capture is bounded (~2.5 KB observed: round 3's
    // 85-query line lost its last 7 entries). Two size controls keep the
    // whole line inside it at 95+ queries: 3-decimal rounding, and keys
    // shortened to the unambiguous "qNN" prefix (full names live in
    // SparkEntry.queries / BASELINE.md).
    val shortKeys = results.keys.map(_.takeWhile(_ != '_')).toSeq
    require(shortKeys.distinct.size == shortKeys.size,
      "qNN prefixes must stay unique — a collision would emit duplicate JSON keys: " +
        shortKeys.diff(shortKeys.distinct).mkString(", "))
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k.takeWhile(_ != '_') + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val anchorsJson = anchors.map(r3).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","anchor":${r3(anchor)},"anchors":$anchorsJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
