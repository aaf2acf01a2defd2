package graft

import org.apache.spark.sql.functions._

/** Semantics of the pipeline-composition operators (ops/Pipeline.scala). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("containment flags a sub-document dup that Jaccard misses") {
    // B = A's text wrapped in enough boilerplate that J(A,B) < 0.6 while
    // every shingle of A is inside B (containment = 1.0).
    val core = (1 to 12).map(i => s"w$i").mkString(" ")
    val pad = (1 to 30).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, core),
      (2L, s"$pad $core"),
      (3L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")

    val cont = ops.Pipeline.containmentPairs(docs, threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(cont == Set((1L, 2L)))

    val jac = ops.Dedup.jaccardNearDups(docs, threshold = 0.6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L))) // the pair containment exists to catch
  }

  test("containment threshold is inclusive and uses the smaller set") {
    // Both docs share a 9-shingle prefix then diverge; C = 9 / min(n1, n2).
    val shared = (1 to 11).map(i => s"s$i").mkString(" ") // 9 shingles
    val docs = Seq(
      (1L, s"$shared x1 y1 z1"),                           // 12 more tokens → diverges
      (2L, s"$shared a1 b1 c1 d1 e1 f1 g1 h1 i1 j1 k1")
    ).toDF("doc_id", "text")
    val c = ops.Pipeline.containmentPairs(docs, threshold = 0.5)
      .select("containment").as[Double].collect()
    assert(c.length == 1)
    val cHigh = ops.Pipeline.containmentPairs(docs, threshold = c(0) + 1e-9)
    assert(cHigh.count() == 0) // strictly-above threshold excludes the pair
  }

  test("incremental dedup only pairs new batch against existing corpus") {
    val out = ops.Pipeline.q94IncrementalDedup(spark, sfDir)
    val docs = graft.sources.Tables.t(spark, sfDir, "documents")
      .withColumn("src_num", expr("CAST(substring(source, 4) AS INT)"))
    val newIds = docs.filter(col("src_num") >= 10)
      .select("doc_id").as[Long].collect().toSet
    val oldIds = docs.filter(col("src_num") < 10)
      .select("doc_id").as[Long].collect().toSet
    val rows = out.select("doc_id", "best_match_id").as[(Long, Long)].collect()
    assert(rows.map(_._1).toSet == newIds)
    rows.filter(_._2 >= 0).foreach { case (_, best) => assert(oldIds.contains(best)) }
  }

  test("quality funnel stages are monotonically non-increasing") {
    val rows = ops.Pipeline.q92QualityFunnel(spark, sfDir)
      .select("n_total", "n_len", "n_ttr", "n_rep", "n_final")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t0, t1, t2, t3, t4) =>
      assert(t0 >= t1 && t1 >= t2 && t2 >= t3 && t3 >= t4)
    }
  }

  test("pair features are internally consistent and cover the q51 verdict set") {
    val feats = ops.Pipeline.q96PairFeatures(spark, sfDir)
      .select("id1", "id2", "jaccard", "containment", "len_ratio", "hamming")
      .as[(Long, Long, Double, Double, Double, Long)].collect()
    assert(feats.nonEmpty)
    feats.foreach { case (_, _, j, c, lr, h) =>
      assert(c >= j, "containment can never be below jaccard")
      assert(j >= 0.3 && c <= 1.0)
      assert(lr > 0.0 && lr <= 1.0)
      assert(h >= 0 && h <= 60)
    }
    // The q51 verdict pairs (J >= 0.6) are a subset of the feature table.
    val featPairs = feats.map(f => (f._1, f._2)).toSet
    val verdicts = ops.Dedup.q51DedupJaccard(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(verdicts.subsetOf(featPairs))
  }

  test("split leakage pairs straddle splits and are a subset of q51 pairs") {
    val leak = ops.Pipeline.q93SplitLeakage(spark, sfDir)
    val all = ops.Dedup.q51DedupJaccard(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val rows = leak.select("id1", "id2", "split1", "split2")
      .as[(Long, Long, String, String)].collect()
    rows.foreach { case (a, b, s1, s2) =>
      assert(all.contains((a, b)))
      assert(s1 != s2)
    }
  }
}
