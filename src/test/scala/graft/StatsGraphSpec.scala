package graft

import org.apache.spark.sql.functions._

/** Properties of the round-5 statistics/graph/event operators that the
  * hash-matching oracle can't express: algebraic invariants (row-normalized
  * probabilities, interval contiguity, triangle identities) on adversarial
  * in-memory fixtures.
  */
class StatsGraphSpec extends SparkSpec {

  test("q131 triangle counts satisfy the handshake identity on a known graph") {
    // Build a corpus-free check directly on the operator's graph math by
    // running the full operator on fixture documents: a planted 3-clique
    // of identical docs closes exactly one triangle, each member counting
    // it once; a 2-chain (a~b~c without a~c) closes none.
    import spark.implicits._
    val clique = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // Chain geometry in exact shingle arithmetic: base has 30 distinct
    // words (28 trigram shingles); each tail adds 10 more (+10 shingles).
    // J(4,5) = 28/38 ≈ 0.74 ≥ 0.6 (edge), J(4,6) = 28/48 ≈ 0.58 < 0.6
    // (no closing edge), so 4~5~6 is an open chain.
    val base = (1 to 30).map(i => f"b$i%02d").mkString(" ")
    val tailC = (1 to 10).map(i => f"c$i%02d").mkString(" ")
    val tailD = (1 to 10).map(i => f"d$i%02d").mkString(" ")
    val docs = Seq(
      (1L, clique), (2L, clique), (3L, clique),
      (4L, s"$base $tailC"),
      (5L, base),
      (6L, s"$base $tailD")
    ).toDF("doc_id", "text")
    val handle = new ops.StorageHandle
    val out = ops.Graph.triangleCounts(docs, handle).collect()
    handle.release()
    val byId = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId.get(1L).contains(1L) && byId.get(2L).contains(1L) && byId.get(3L).contains(1L),
      s"3-clique members must each close exactly 1 triangle: ${byId.mkString(",")}")
    assert(!byId.contains(4L) && !byId.contains(6L),
      s"open chain must close no triangle: ${byId.mkString(",")}")
  }

  test("q131 skew stress: degree orientation bounds wedge fan-out under a hot hub + dense clique") {
    // Adversarial graph (VERDICT r5 item 7): a 400-leaf star (the hot-key
    // shape natural dup graphs produce around boilerplate templates) plus
    // a 40-vertex clique (the dense end). Unoriented wedge generation
    // from the hub alone is C(400,2) = 79,800; the (degree, id)
    // orientation points every star edge leaf→hub (degree 1 < 400), so
    // the hub generates ZERO wedges and the whole wedge volume collapses
    // to the clique's bounded fan-out.
    import spark.implicits._
    val star = (1L to 400L).map(leaf => (1000L + leaf, 5000L)) // hub = 5000
    val clique = for {
      a <- 1L to 40L; b <- (a + 1) to 40L
    } yield (2000L + a, 2000L + b)
    val edges = (star ++ clique).toDF("id1", "id2")
    val handle = new ops.StorageHandle
    val out = ops.Graph.triangleCountsFromEdges(edges, handle).collect()
    handle.release()
    val byId = out.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Correctness under skew: the star closes nothing; every clique
    // vertex closes C(39,2) = 741 triangles at degree 39.
    assert(!byId.contains(5000L) && !byId.exists(kv => kv._1 > 1000L && kv._1 <= 1400L),
      "star vertices must close no triangles")
    (1L to 40L).foreach { a =>
      assert(byId(2000L + a) == ((39L, 741L)), s"clique vertex $a: ${byId(2000L + a)}")
    }
    // The bound itself: replicate the operator's orientation rule and
    // assert max oriented out-degree ≤ clique degree (39) even though the
    // max UNDIRECTED degree is 400 — the wedge join's per-vertex fan-out
    // is C(outdeg, 2), so this is the line between 741 wedges and 79,800.
    val deg = edges.select(col("id1").as("v")).unionByName(edges.select(col("id2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val outDeg = edges
      .join(deg.as("d1"), col("id1") === col("d1.v"))
      .join(deg.as("d2"), col("id2") === col("d2.v"))
      .select(when(col("d1.d") < col("d2.d") ||
        (col("d1.d") === col("d2.d") && col("id1") < col("id2")),
        col("id1")).otherwise(col("id2")).as("src"))
      .groupBy("src").agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).as[Long].head()
    assert(outDeg <= 39L, s"orientation failed to bound fan-out: max out-degree $outDeg")
  }

  test("q134 skew stress: hot source (75% of rows) medians stay exact through the spillable sort") {
    // One source owns 75% of the corpus — the skewed-shuffle shape where
    // a collect-based or in-memory median would concentrate the corpus on
    // one task. The operator's median is a row_number window over a
    // shuffle SORT (UnsafeExternalSorter — spills to disk instead of
    // OOM), so the hot key costs time, not memory. Assert the plan uses
    // exactly that shape (Window over Sort, no collect boundary) and that
    // the answer on the hot fixture is exact.
    import spark.implicits._
    val hot = (1 to 3000).map(i => (i.toLong, "hot", (i % 101).toLong * 10L))
    val cold = (1 to 1000).map(i => (3000L + i, s"cold${i % 5}", i.toLong))
    val docs = (hot ++ cold).toDF("doc_id", "source", "n_chars")
    val out = ops.Stats.madOutliers(docs)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(plan.contains("Sort"), plan)
    assert(!plan.contains("CollectLimit"), plan)
    val rows = out.collect()
    // Exact check for the hot source: n_chars uniform over {0,10,...,1000}
    // → median 500, MAD 250, fence 750 → |x−500| > 750 never holds: the
    // hot source must produce NO outliers (a mean/stddev fence would,
    // under this symmetric distribution, also be quiet — the point here is
    // the exact integer answer surviving the skewed sort, not robustness,
    // which "q134 MAD fence is robust" already pins).
    assert(!rows.exists(_.getString(0) == "hot"),
      s"hot source flagged: ${rows.filter(_.getString(0) == "hot").take(3).mkString(";")}")
    // Cold sources still evaluated independently and exactly.
    assert(rows.forall(r => r.getDouble(5) > 3.0 * r.getDouble(4)))
  }

  test("q138 histogram MAD agrees with the exact fence: quiet on uniform skew, catches the planted extreme") {
    import spark.implicits._
    // Same hot-source shape as the q134 stress + one source with a
    // planted 50x-length outlier. The bin-upper-edge fence must stay
    // quiet where the exact fence is quiet, and still flag the extreme.
    val hot = (1 to 3000).map(i => (i.toLong, "hot", (i % 101).toLong * 10L))
    val planted = (1 to 20).map(i => (4000L + i, "pl", 100L)) :+ ((4021L, "pl", 5000L))
    val docs = (hot ++ planted).toDF("doc_id", "source", "n_chars")
    val hist = ops.Stats.madOutliersHist(docs).collect()
    assert(!hist.exists(_.getString(0) == "hot"),
      s"hist fence flagged the uniform hot source: ${hist.take(3).mkString(";")}")
    assert(hist.count(_.getString(0) == "pl") == 1 &&
      hist.find(_.getString(0) == "pl").get.getLong(1) == 4021L,
      s"planted extreme not isolated: ${hist.mkString(";")}")
    // Conservative by construction: everything the histogram fence flags,
    // the exact fence flags too (mad_ub >= true MAD, med within one bin).
    val exact = ops.Stats.madOutliers(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    hist.foreach { r =>
      assert(exact.contains((r.getString(0), r.getLong(1))),
        s"hist fence over-flagged ${(r.getString(0), r.getLong(1))}")
    }
  }

  test("q132 transition probabilities row-normalize to 1 per from-state") {
    val rows = ops.EventOps.q132TransitionMatrix(spark, sfDir)
      .groupBy(col("from_type")).agg(sum(col("p_r")).as("s"))
      .collect()
    rows.foreach { r =>
      // Each p_r rounds once to 6 dp; the row sum can be off by at most
      // 0.5e-6 per cell (5 cells).
      assert(math.abs(r.getDouble(1) - 1.0) < 3e-6, s"row ${r.getString(0)} sums to ${r.getDouble(1)}")
    }
  }

  test("q133 SCD2 intervals are contiguous per user and exactly one row is current") {
    val hist = ops.EventOps.q133Scd2History(spark, sfDir).collect()
    hist.groupBy(_.getLong(0)).foreach { case (user, rows) =>
      val sorted = rows.sortBy(_.getLong(1)) // by version
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) == b.getTimestamp(3),
            s"user $user: version ${a.getLong(1)} valid_to != next valid_from")
        case _ =>
      }
      assert(sorted.count(_.getBoolean(5)) == 1, s"user $user: exactly one current row")
      assert(sorted.last.getBoolean(5), s"user $user: last version must be current")
      // Consecutive versions must actually change state (runs collapsed).
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getString(2) != b.getString(2),
            s"user $user: consecutive versions share state ${a.getString(2)}")
        case _ =>
      }
    }
  }

  test("q134 MAD fence is robust where a mean/stddev fence is not") {
    import spark.implicits._
    // 20 docs at length 100, one at 1e6: the outlier drags a 3-sigma mean
    // fence so far that it catches nothing else, but it cannot move the
    // median fence. MAD flags exactly the planted point.
    val docs = ((1 to 20).map(i => (i.toLong, "src", 100L + (i % 3))) :+ (99L, "src", 1000000L))
      .toDF("doc_id", "source", "n_chars")
    val out = ops.Stats.madOutliers(docs).select("doc_id").as[Long].collect()
    assert(out.toSet == Set(99L), s"expected exactly the planted outlier, got ${out.mkString(",")}")
  }

  test("q135 histogram quantiles are monotone and bracket the exact quantile from above") {
    val rows = ops.Stats.q135HistQuantiles(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p50 <= p90 && p90 <= p99, s"quantile read-off must be monotone: $r")
    }
    // Upper-edge report: at least half the group sits at or under p50_ub.
    val docs = graft.sources.Tables.t(spark, sfDir, "documents")
    rows.foreach { r =>
      val src = r.getString(0)
      val under = docs.filter(col("source") === src && col("n_chars") <= r.getLong(3)).count()
      val total = r.getLong(1)
      assert(under * 2 >= total, s"$src: p50 upper edge covers only $under of $total")
    }
  }

  test("q136 decay weights are the exact scaled geometric series and normalize correctly") {
    // A constant series must smooth to itself: ewma_r == the constant.
    import spark.implicits._
    val const = (1 to 12).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-01-01 00:00:${i}%02d"), 7L, 2.5))
      .toDF("event_id", "ts", "user_id", "value")
    val out = ops.Stats.decayTrailing(const)
      .orderBy(col("event_id")).collect()
    // After warm-up (8 rows), every smoothed value equals the input.
    out.drop(7).foreach { r =>
      assert(math.abs(r.getDouble(5) - 250.0) < 1e-6,
        s"constant series must smooth to itself: $r")
    }
  }
}
