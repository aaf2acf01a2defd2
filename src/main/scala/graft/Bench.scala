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

  /** Prior-round bench line, if SPARK_GRAFT_PRIOR points at one: the
    * (anchor, short-key -> sec) pair the self-adjudication pass compares
    * against. Accepts either a raw bench line or the driver's
    * {"tail": "..."} wrapper, same as tools/compare_bench.py.
    */
  private def loadPrior(path: String): Option[(Double, Map[String, Double])] = {
    import scala.jdk.CollectionConverters._
    try {
      val txt0 = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val txt = {
        // Driver wrapper: the bench line lives (escaped) inside "tail".
        val t = try {
          val w = mapper.readTree(txt0)
          if (w != null && w.has("tail")) w.get("tail").asText() else txt0
        } catch { case _: Throwable => txt0 }
        val m = """\{"metric":"total".*?"sf":"[^"]*"\}""".r.findAllIn(t).toSeq
        if (m.isEmpty) return None
        m.last
      }
      val node = mapper.readTree(txt)
      val anchor = if (node.has("anchor")) node.get("anchor").asDouble() else return None
      val qs = node.get("queries")
      val m = qs.fieldNames().asScala.map(k => k -> qs.get(k).asDouble()).toMap
      Some((anchor, m))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] prior bench load failed ($path): ${e.getMessage}")
      None
    }
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
    // Timed execution = a noop-format write of the FULL plan. count() let
    // Catalyst's EliminateSorts drop each query's terminal presentation
    // sort beneath the count aggregate, so the deterministic-ordering tail
    // most queries end with was never in the timed path (VERDICT r6 item
    // 2). The noop v2 sink consumes every row through the complete plan —
    // sorts, projections and all — with zero serialization cost. Expect a
    // small one-time level shift vs rounds <= 6 (recorded in BASELINE.md).
    def timedRun(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 name: String): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save() } catch {
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
    //   3. per-query heap/GC telemetry appended to a JSONL side file AS
    //      EACH QUERY COMPLETES (a buffered single final write would lose
    //      everything to exactly the mid-suite OOM the telemetry exists to
    //      diagnose — ADVICE r6).
    val anchorEvery = 20
    val telemetryPath = sys.env.getOrElse(
      "SPARK_GRAFT_TELEMETRY", "target/bench_telemetry.jsonl")
    val telemetryFile = {
      try {
        val p = java.nio.file.Paths.get(telemetryPath)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, Array.emptyByteArray) // truncate prior run
        Some(p)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] telemetry file unavailable: ${e.getMessage}")
        None
      }
    }
    def telemetryAppend(line: String): Unit = telemetryFile.foreach { p =>
      try java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.APPEND)
      catch { case e: Throwable =>
        System.err.println(s"[bench] telemetry append failed: ${e.getMessage}")
      }
    }
    val anchors = scala.collection.mutable.ArrayBuffer[Double]()
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val firstPass = selected.zipWithIndex
      .map { case ((name, fn), qi) =>
        // Mid-suite anchors use the same min-of-3 as the headline anchor:
        // on a box with ±40% ambient swing, 2-sample anchors fed the
        // comparator's rising-trend heuristic false positives (ADVICE r6).
        if (qi > 0 && qi % anchorEvery == 0) anchors += measureAnchor(3)
        val (gcN0, gcMs0) = gcTotals()
        val times = (1 to 3).map(_ => timedRun(fn, name))
        // Untimed: give the ContextCleaner the GC it needs to find dead
        // broadcast/shuffle references before the next query piles more on.
        System.gc()
        val (gcN1, gcMs1) = gcTotals()
        telemetryAppend(
          s"""{"q":"$name","sec":${r3(times.min)},"runs":[${times.map(r3).mkString(",")}],""" +
            s""""heap_mb":${heapUsedMb()},"gc_n":${gcN1 - gcN0},"gc_ms":${gcMs1 - gcMs0}}""")
        name -> times.min
      }
    anchors += measureAnchor(3)
    // Self-adjudicating regression flags (VERDICT r6 item 4): round 6's
    // comparator produced 6 false positives from ambient drift between
    // anchor readings — each cleared only by a manual isolated re-run.
    // Automate that adjudication: when a prior bench line is supplied
    // (SPARK_GRAFT_PRIOR), re-measure — once, at suite end, min-of-3 —
    // every query whose anchor-normalized ratio vs the prior round
    // exceeds the flag threshold, and report min(first pass, re-run).
    // The min over all measured runs is the same steady-state estimator
    // the 3-run minimum already is; the re-run happens after the suite's
    // memory pressure has been GC'd away, which is exactly the isolated
    // condition the manual adjudications used.
    val prior = sys.env.get("SPARK_GRAFT_PRIOR").flatMap(loadPrior)
    val flagThreshold = sys.env.get("SPARK_GRAFT_FLAG_RATIO").map(_.toDouble).getOrElse(1.5)
    val byName = selected.toMap
    val remeasured = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results: Map[String, Double] = prior match {
      case Some((priorAnchor, priorQs)) =>
        val anchorRatio = anchor / priorAnchor
        firstPass.toMap.map { case (name, sec) =>
          val short = name.takeWhile(_ != '_')
          val flagged = priorQs.get(short).exists { old =>
            old > 0 && (sec / old) / anchorRatio > flagThreshold }
          if (!flagged) name -> sec
          else {
            val re = (1 to 3).map(_ => timedRun(byName(name), name)).min
            System.gc()
            remeasured += short -> re
            telemetryAppend(s"""{"q":"$name","remeasured_sec":${r3(re)},"first_pass_sec":${r3(sec)}}""")
            name -> math.min(sec, re)
          }
        }
      case None => firstPass.toMap
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
    // "audit": ground-truth audit baselines (intentionally corpus-scale
    // formulations paired with registered production postures) — emitted
    // so downstream tooling separates them mechanically (VERDICT r6 item 3).
    val auditJson = SparkEntry.auditBaselines.toSeq.sorted
      .map(n => "\"" + n.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    val remeasJson =
      if (remeasured.isEmpty) ""
      else remeasured.map { case (k, v) => s"\"$k\":${r3(v)}" }
        .mkString(""","remeasured":{""", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","anchor":${r3(anchor)},"anchors":$anchorsJson,"audit":$auditJson$remeasJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
