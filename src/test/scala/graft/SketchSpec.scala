package graft

import org.apache.spark.sql.functions._
import graft.ops.{Sketches, Similarity, TextAnalysis}

/** Properties of the round-5 sketch/sampling/mining additions that the
  * oracle's hash-match can't express on its own:
  *   - the Count-Min gate is SOUND (never drops a true heavy hitter) and
  *     the sketch never underestimates — the two halves of the
  *     Cormode–Muthukrishnan guarantee the q121 design leans on;
  *   - the weighted sample is partitioning-invariant and weight-monotone;
  *   - char entropy hits its closed-form extremes;
  *   - hard negatives respect the dup-exclusion band and rank contract.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("q121 gate soundness: sketch-gated output == exact heavy hitters, incl. a threshold-boundary token") {
    // 'hot' is ~45% of mass; 'warm' lands EXACTLY on the threshold
    // boundary (cnt * ratio == total tokens = 135) — the inclusive >=
    // must keep it in both the gate and the final filter.
    val docs = docsOf(
      (1L, Array.fill(60)("hot").mkString(" ")),
      (2L, (1 to 30).map(i => s"tail$i").mkString(" ") + " " + Array.fill(15)("warm").mkString(" ")),
      (3L, (31 to 60).map(i => s"tail$i").mkString(" ")))
    val got = Sketches.heavyHitters(docs, ratio = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val total = toks.count()
    val exact = toks.groupBy("tok").count()
      .filter(col("count") * 10 >= total)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == exact, s"gated=$got exact=$exact")
    assert(got.contains("hot") && got.contains("warm"))
  }

  test("q121 overestimate property: the CM estimate is >= the exact count for every token") {
    // 3000 types >> w=256 buckets, so every bucket carries collisions —
    // the estimate must still never fall below truth, only above it.
    val docs = docsOf((1 to 300).map(i =>
      (i.toLong, (1 to 10).map(j => s"w${(i * 7 + j * 13) % 3000}").mkString(" "))): _*)
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val d = Sketches.cmDepth
    val w = Sketches.cmWidth
    def bucket(i: Int) = pmod(xxhash64(col("tok"), lit(i)), lit(w)).cast("int")
    val cells = toks.select(posexplode(array((0 until d).map(bucket): _*))
      .as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
    assert(cells.count() <= d.toLong * w) // bounded-state claim
    val sketch = cells.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val perTok = toks.groupBy("tok").count()
      .select(col("tok") +: col("count") +: (0 until d).map(i => bucket(i).as(s"b$i")): _*)
      .collect()
    assert(perTok.length > w) // collisions guaranteed
    val under = perTok.filter { r =>
      val est = (0 until d).map(i => sketch.getOrElse((i, r.getInt(2 + i)), 0L)).min
      est < r.getLong(1)
    }
    assert(under.isEmpty, s"CM underestimated ${under.length} tokens, e.g. ${under.take(3).mkString(",")}")
  }

  test("q121 streaming dual: CM cells aggregate live with bounded state and converge to the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[String]
    val toks = mem.toDF().select(explode(split(col("value"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val q = Sketches.cmCells(toks).writeStream
      .format("memory").queryName("cm_cells").outputMode("complete").start()
    try {
      mem.addData("hot hot hot tail1", "hot tail2 tail2")
      q.processAllAvailable()
      mem.addData("hot warm warm tail3")
      q.processAllAvailable()
      val streamed = spark.table("cm_cells").collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val batch = Sketches.cmCells(
        Seq("hot hot hot tail1", "hot tail2 tail2", "hot warm warm tail3")
          .toDF("value").select(explode(split(col("value"), " ")).as("tok"))
          .filter(length(col("tok")) > 0)).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(streamed == batch) // incremental state == one-shot batch
      assert(streamed.size <= Sketches.cmDepth * Sketches.cmWidth) // bounded
    } finally q.stop()
  }

  test("q122 weighted sample is partitioning-invariant and weight-monotone") {
    val docs = docsOf((1 to 400).map(i =>
      (i.toLong, if (i % 2 == 0) "x" * 400 else "x" * 50)): _*)
    val a = Sketches.weightedSample(docs, k = 40).collect().toSeq
    val b = Sketches.weightedSample(docs.repartition(7), k = 40).collect().toSeq
    assert(a == b) // determinism under any physical layout
    assert(a.size == 40)
    // 8x-weight docs must dominate ~8/9 of the sample; a loose floor
    // proves the priority actually uses the weight.
    val heavy = a.count(_.getAs[Long]("n_chars") == 400L)
    assert(heavy >= 30, s"heavy=$heavy of 40")
  }

  test("graft_char_entropy equals the explode+groupBy entropy formulation doc-for-doc") {
    // The codegen'd per-row histogram (VERDICT r5 item 4) must reproduce
    // the SQL formulation it replaced bit-for-bit on the real corpus —
    // same double division, same Math.log, same HALF_UP micro-rounding.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val viaExpr = TextAnalysis.charEntropy(docs)
      .select("doc_id", "n_distinct_chars", "ent_micro")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val chars = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
    val counts = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("len"), count(lit(1)).as("n_distinct_chars"))
    val viaSql = counts.join(totals, "doc_id")
      .withColumn("p", col("cnt").cast("double") / col("len"))
      .withColumn("micro", round(col("p") * log(col("p")) * 1e6).cast("long"))
      .groupBy(col("doc_id"), col("n_distinct_chars"))
      .agg((-sum(col("micro"))).as("ent_micro"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaExpr == viaSql,
      s"diverged on ${viaExpr.keySet.union(viaSql.keySet).find(k => viaExpr.get(k) != viaSql.get(k))}")
  }

  test("graft_char_trigrams equals the substring+sequence+explode formulation trigram-for-trigram") {
    graft.functions.VectorExpressions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val viaExpr = docs
      .select(explode(expr("graft_char_trigrams(text)")).as(Seq("trigram", "c")))
      .groupBy("trigram").agg(sum(col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaSql = docs
      .select(explode(expr(
        """IF(length(text) >= 3,
              transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)),
              array())""")).as("trigram"))
      .groupBy("trigram").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaSql,
      s"diverged on ${viaExpr.keySet.union(viaSql.keySet).find(k => viaExpr.get(k) != viaSql.get(k))}")
    // Edge rows: under-3-char and empty texts emit empty maps (no rows).
    val edge = Seq((1L, "ab"), (2L, ""), (3L, "abc")).toDF("doc_id", "text")
      .select(explode(expr("graft_char_trigrams(text)")).as(Seq("trigram", "c")))
      .collect()
    assert(edge.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("abc", 1L)))
  }

  test("q123 entropy extremes: single-char text scores 0; uniform alphabets score ln(k) micro-nats") {
    // ln(8) = 2.08 nats sits BELOW the 2.5 low-entropy line (8 distinct
    // chars is still degenerate); ln(16) = 2.77 clears it.
    val docs = docsOf((1L, "aaaaaaaa"), (2L, "abcdefgh"), (3L, "abcdefghijklmnop"))
    val got = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((1L, 0L, true)))
    // Per-term micro-rounding, THEN the sum — matching the operator.
    def lnK(k: Int) = -k * math.round(1.0 / k * math.log(1.0 / k) * 1e6)
    assert(got(2L) == ((8L, lnK(8), true)), s"${got(2L)} != (8, ${lnK(8)}, true)")
    assert(got(3L) == ((16L, lnK(16), false)), s"${got(3L)} != (16, ${lnK(16)}, false)")
  }

  test("q124 hard negatives: dup band excluded, ranks contiguous, a planted duplicate never surfaces") {
    graft.functions.VectorExpressions.register(spark)
    // Plant an exact copy of query vector 5 under a fresh id: identical
    // buckets in every table guarantee it's a candidate, and cosine
    // |v5|^2 >= 0.45 puts it squarely in the dup band the miner must drop.
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val clone = base.filter(col("vec_id") === 5)
      .withColumn("vec_id", lit(99999L))
    val emb = base.unionByName(clone)
    val norm5 = base.filter(col("vec_id") === 5)
      .selectExpr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0D, (a, v) -> a + v) AS n")
      .head().getDouble(0)
    assert(norm5 >= 0.45, s"fixture norm |v5|^2 = $norm5 too small to land in the dup band")
    val hn = Similarity.hardNegatives(emb).collect()
    assert(hn.nonEmpty)
    assert(hn.forall(_.getDouble(3) < 0.45)) // no dup/positive leaks through
    hn.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length.toLong),
        s"ranks not contiguous for query $q")
    }
    val hnPairs = hn.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(!hnPairs.contains((5L, 99999L)), "planted duplicate surfaced as a hard negative")
  }

  test("q125 RRF fusion: scores recompute from the rank columns, both rankers contribute, query excluded") {
    graft.functions.VectorExpressions.register(spark)
    val out = Similarity.q125HybridRetrieval(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (lex, dense, rrf) = (r.getLong(3), r.getLong(4), r.getLong(2))
      def part(rk: Long) = if (rk == 0) 0L else math.round(1000000.0 / (60 + rk))
      assert(rrf == part(lex) + part(dense), s"rrf $rrf != ${part(lex)} + ${part(dense)}")
      assert(lex > 0 || dense > 0, "fused doc came from neither ranker")
      assert(r.getLong(1) != 0L, "the dense query doc leaked into the fused list")
    }
    // Non-vacuous fusion: each ranker places at least one doc.
    assert(out.exists(_.getLong(3) > 0) && out.exists(_.getLong(4) > 0))
  }

  test("degenerate inputs: uniform corpus yields no heavy hitters; short series yield no pattern windows") {
    // q121 on a perfectly uniform corpus with ratio tighter than 1/vocab:
    // nothing clears total/ratio — the gate and the exact filter must both
    // agree on empty, not throw.
    val uniform = docsOf((1 to 50).map(i => (i.toLong, s"u$i v$i w$i")): _*)
    assert(graft.ops.Sketches.heavyHitters(uniform, ratio = 100).count() == 0)
    // q126 with every user's series shorter than m: no full window exists.
    import java.sql.Timestamp
    val short = (1 to 5).map(i =>
      (i.toLong, Timestamp.valueOf(s"2024-01-01 00:0$i:00"), 1L, 1.0 * i))
      .toDF("event_id", "ts", "user_id", "value")
    assert(graft.ops.EventOps.patternScan(short, Seq.fill(8)(100L)).count() == 0)
  }

  test("q128 KMV: mergeable (union sketch == k-smallest of per-half sketches) and error-bounded") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val uExpr = "CAST(conv(substring(md5(concat('kmv:', shingle)), 1, 8), 16, 10) AS BIGINT)"
    def hashes(d: org.apache.spark.sql.DataFrame) = d.select(col("source"), explode(expr(
      """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
                   i -> concat_ws(' ', slice(split(text, ' '), i, 3)))""")).as("shingle"))
      .distinct().withColumn("u", expr(uExpr))
    def sketch(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("u"), col("shingle"))))
      .filter(col("rk") <= 64).drop("rk")
    val full = sketch(hashes(docs))
    // Shard the corpus, sketch each shard, merge (union + re-take k): the
    // merged sketch must equal the full-corpus sketch exactly — the
    // property that makes KMV a distributed-aggregation-safe state.
    val merged = sketch(
      sketch(hashes(docs.filter(col("doc_id") % 2 === 0)))
        .unionByName(sketch(hashes(docs.filter(col("doc_id") % 2 =!= 0))))
        .dropDuplicates("source", "shingle"))
    val a = full.collect().map(r => (r.getString(0), r.getString(1))).toSet
    val b = merged.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(a == b, s"merge broke the sketch: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
    // Estimator sanity: every per-source estimate within 50% of truth
    // (k=64 gives ~12.5% standard error; 4 sigma is a safe pin).
    val rep = graft.ops.Sketches.kmvDistinct(docs).collect()
    rep.foreach { r =>
      assert(r.getLong(3) <= 500000L,
        s"${r.getString(0)}: est ${r.getLong(2)} vs exact ${r.getLong(1)} (${r.getLong(3)} ppm)")
    }
  }

  test("q130 sketch algebra: complete sketches (distinct < k) make union/intersection estimates EXACT") {
    // Two sources built from disjoint+shared word pools, each well under
    // k=256 distinct shingles: the pooled pair sketch is then the complete
    // union, and every estimate must collapse to the exact value.
    def text(words: Seq[String]) = words.mkString(" ")
    val shared = (1 to 30).map(i => s"sh$i")
    val docs = Seq(
      (1L, text((1 to 40).map(i => s"a$i") ++ shared), "srcA", 0L),
      (2L, text((1 to 40).map(i => s"b$i") ++ shared), "srcB", 0L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = Sketches.kmvOverlap(docs).collect()
    assert(out.length == 1)
    val r = out.head
    val (estU, estI, exactI) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(estI == exactI, s"complete-sketch intersection $estI != exact $exactI")
    // Exact union = |A| + |B| - |A∩B|; per-source distinct shingle counts
    // come from the same operator's q128 sibling on this fixture.
    val perSrc = Sketches.kmvDistinct(docs).collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    assert(estU == perSrc("srcA") + perSrc("srcB") - exactI,
      s"union $estU != ${perSrc("srcA")} + ${perSrc("srcB")} - $exactI")
  }

  test("KmvAgg: partitioning-invariant, duplicate-blind, merge == sketch-of-union") {
    // The bounded-state aggregate behind q128b/q130b must produce the
    // SAME sorted array no matter how the input is partitioned or
    // duplicated — that's what makes the estimate deterministic across a
    // 1000-executor shuffle. Exercise reduce+merge directly.
    val agg = new graft.functions.KmvAgg(8)
    val vals = Seq(50L, 3L, 97L, 3L, 14L, 80L, 22L, 61L, 8L, 45L, 14L, 99L, 1L, 73L, 36L)
    val whole = vals.foldLeft(agg.zero)(agg.reduce)
    // Split three ways with duplicates crossing the boundary, merge in an
    // arbitrary tree shape.
    val (p1, rest) = vals.splitAt(4)
    val (p2, p3) = rest.splitAt(5)
    val m = agg.merge(
      p1.foldLeft(agg.zero)(agg.reduce),
      agg.merge(p2.foldLeft(agg.zero)(agg.reduce), p3.foldLeft(agg.zero)(agg.reduce)))
    assert(whole.toSeq == m.toSeq)
    // k smallest DISTINCT of the multiset, ascending.
    assert(whole.toSeq == vals.distinct.sorted.take(8))
    // Saturated fast path: feeding values above the current max is a no-op.
    val sat = (1L to 8L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(sat, 100L).toSeq == (1L to 8L))
    // Empty-side merges.
    assert(agg.merge(agg.zero, sat).toSeq == (1L to 8L))
    assert(agg.merge(sat, agg.zero).toSeq == (1L to 8L))
  }

  test("q128b/q130b sketch-only estimates agree with the exact-audit baselines where complete") {
    // On the q130 complete-sketch fixture (distinct < k) the sketch-only
    // variants must reproduce the audit variants' estimates EXACTLY —
    // dropping the audit branch changes the plan, never the estimator.
    def text(words: Seq[String]) = words.mkString(" ")
    val shared = (1 to 30).map(i => s"sh$i")
    val docs = Seq(
      (1L, text((1 to 40).map(i => s"a$i") ++ shared), "srcA", 0L),
      (2L, text((1 to 40).map(i => s"b$i") ++ shared), "srcB", 0L))
      .toDF("doc_id", "text", "source", "n_chars")
    val audit = Sketches.kmvOverlap(docs).collect().head
    val sketchOnly = Sketches.kmvOverlapSketch(docs).collect().head
    assert(sketchOnly.getLong(2) == audit.getLong(2), "est_union diverged")
    assert(sketchOnly.getLong(3) == audit.getLong(3), "est_inter diverged")
    // q128b kk (complete sketch) == exact distinct-u count == q128's
    // exact_distinct when no 32-bit collisions exist (true on this tiny
    // fixture).
    // k=256 keeps the per-source sketches complete here (68 distinct
    // shingles each > the default k=64, which would saturate).
    val exact = Sketches.kmvDistinct(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Sketches.kmvDistinctSketch(docs, k = 256).collect().foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)),
        s"${r.getString(0)}: sketch kk ${r.getLong(1)} != exact ${exact(r.getString(0))}")
      assert(r.getLong(3) == exact(r.getString(0)), "complete-sketch estimate must be exact")
    }
  }

  test("q128b estimator error is bounded on the sf corpus (k=64 ⇒ ~12.5% se; pin 50%)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // Exact distinct-u per source (the sketch's universe), computed here
    // in the SPEC — this vocabulary-sized job is exactly what the
    // registered query no longer runs (VERDICT r5 item 3).
    val exact = docs.select(col("source"), explode(expr(
      """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
                   i -> concat_ws(' ', slice(split(text, ' '), i, 3)))""")).as("shingle"))
      .select(col("source"), expr(
        "CAST(conv(substring(md5(concat('kmv:', shingle)), 1, 8), 16, 10) AS BIGINT)").as("u"))
      .distinct().groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Sketches.kmvDistinctSketch(docs).collect().foreach { r =>
      val (src, est) = (r.getString(0), r.getLong(3))
      val ex = exact(src)
      assert(math.abs(est - ex).toDouble / ex <= 0.5,
        s"$src: est $est vs exact $ex — outside 4-sigma")
    }
  }

  test("q129 k-anonymity: generalization only rescues, never newly suppresses") {
    val rep = graft.ops.Pipeline.q129KAnonymity(spark, sfDir).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (suppress, after) = (r.getBoolean(3), r.getBoolean(5))
      assert(!after || suppress, "a group became suppressed only after generalizing")
      assert(r.getLong(4) >= r.getLong(2), "generalized group smaller than its subgroup")
    }
    assert(rep.exists(_.getBoolean(3)), "fixture never exercises suppression")
  }

  test("q126 pattern scan: translation-invariant (mean-centering), planted exact shape scores 0 at rank 1") {
    import java.sql.Timestamp
    val pat = Seq(100L, 120L, 150L, 200L, 150L, 120L, 100L, 90L)
    def ev(user: Long, base: Double) = (0 until 8).map { i =>
      (user * 100 + i, Timestamp.valueOf(s"2024-01-01 00:0$i:00"), user,
        base + pat(i) / 100.0)
    }
    // user 1 carries the exact pattern shifted by a constant (+5.00) —
    // mean-centering must score it 0; user 2 is flat (worst match).
    val rows = ev(1L, 5.0) ++ ev(2L, 0.0).map { case (id, ts, u, _) => (id, ts, u, 1.23) }
    val events = rows.toDF("event_id", "ts", "user_id", "value")
    val out = graft.ops.EventOps.patternScan(events, pat, k = 3).collect()
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 1L
      && out.head.getLong(3) == 0L, out.mkString(";"))
    // Shifting EVERY value by another constant changes nothing.
    val shifted = events.withColumn("value", col("value") + 7.0)
    val out2 = graft.ops.EventOps.patternScan(shifted, pat, k = 3).collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq)
  }
}
