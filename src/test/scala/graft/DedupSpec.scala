package graft

import org.apache.spark.sql.functions._

/** Invariants the DuckDB oracle can't check: SimHash (Spark-internal
  * hashes), LSH recall vs exact baselines, HLL estimate bounds.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("minhash+LSH returns exactly the J>=0.6 pairs (recall check vs q51)") {
    val exact = ops.Dedup.q51DedupJaccard(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = ops.Dedup.q52MinhashLsh(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
    assert(exact.nonEmpty) // testdata plants near-dups; empty would be vacuous
  }

  test("q140 index maintenance: append-then-probe equals recompute-from-scratch") {
    // The nightly-ingest loop: day 1's batch appends its signatures into
    // the persisted index; day 2's batch must then see day-1 vectors as
    // neighbors EXACTLY as if the whole index were rebuilt. Any
    // divergence (missed bucket dir, schema drift on append, partition
    // key mismatch) shows up as a result diff here.
    val emb = graft.sources.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = emb.filter(col("vec_id") % 10 =!= 0)
    val batch1 = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 250)
    val batch2 = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") >= 250)
    val grown = emb.filter(col("vec_id") % 10 =!= 0 || col("vec_id") < 250)
    val incPath = java.nio.file.Files.createTempDirectory("ann-inc").toString + "/idx"
    val fullPath = java.nio.file.Files.createTempDirectory("ann-full").toString + "/idx"
    // Incremental: corpus index, then batch1 appended as new segment files.
    ops.Similarity.annIndexWrite(corpus, incPath)
    ops.Similarity.annIndexWrite(batch1, incPath, mode = "append")
    // Ground truth: one fresh build over corpus + batch1.
    ops.Similarity.annIndexWrite(grown, fullPath)
    val inc = ops.Similarity.annIndexProbe(spark, incPath, batch2).collect().toSeq
    val full = ops.Similarity.annIndexProbe(spark, fullPath, batch2).collect().toSeq
    assert(inc == full, s"incremental index diverged from rebuild: " +
      s"${inc.diff(full).take(3)} vs ${full.diff(inc).take(3)}")
    assert(inc.nonEmpty)
    // The appended batch actually participates: some probe found a
    // batch1 vector (vec_id % 10 == 0, < 250) among its neighbors.
    assert(inc.exists(r => r.getLong(2) % 10 == 0 && r.getLong(2) < 250),
      "no batch1 neighbor surfaced — append was a no-op")
  }

  test("graft_shingle_hashes equals sorted-distinct SQL xxhash64 3-gram chain") {
    graft.functions.VectorExpressions.register(spark)
    val docs = graft.sources.Tables.t(spark, sfDir, "documents")
      .withColumn("toks", split(col("text"), " "))
    // SQL reference: chained xxhash64 of tokens (i, i+1, i+2), per-row
    // distinct, sorted — exactly what the codegen'd expression claims.
    val sqlRef = docs.select(col("doc_id"), expr(
      """sort_array(array_distinct(IF(size(toks) >= 3,
           transform(sequence(1, size(toks) - 2),
             i -> xxhash64(element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))),
           array())))""").as("hs"))
    val fast = docs.select(col("doc_id"), expr("graft_shingle_hashes(toks)").as("hs"))
    assert(sqlRef.exceptAll(fast).isEmpty && fast.exceptAll(sqlRef).isEmpty)
  }

  test("graft_minhash_sig equals the MinHashAgg UDAF on the same hashed shingles") {
    graft.functions.VectorExpressions.register(spark)
    val hs = ops.Dedup.hashedShingleSets(
      graft.sources.Tables.t(spark, sfDir, "documents"))
    val viaExpr = hs.select(col("doc_id"), expr("graft_minhash_sig(hs)").as("sig"))
    val mh = udaf(new graft.functions.MinHashAgg(
      graft.functions.MinHashSigExpr.NumPerm, ops.Dedup.minhashAB,
      graft.functions.MinHashSigExpr.P))
    val viaAgg = hs.select(col("doc_id"),
        explode(expr(s"transform(hs, x -> pmod(x, ${graft.functions.MinHashSigExpr.P}L))")).as("h"))
      .groupBy(col("doc_id")).agg(mh(col("h")).as("sig"))
    assert(viaExpr.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaExpr).isEmpty)
    assert(viaExpr.count() > 0)
  }

  test("graft_minhash_bands equals the transform/xxhash64/slice SQL formulation") {
    graft.functions.VectorExpressions.register(spark)
    val hs = ops.Dedup.hashedShingleSets(
      graft.sources.Tables.t(spark, sfDir, "documents"))
    val fused = hs.select(col("doc_id"), expr("graft_minhash_bands(hs)").as("bands"))
    val sql = hs.select(col("doc_id"), expr(
      "transform(sequence(0, 31), b -> xxhash64(b, slice(graft_minhash_sig(hs), b * 4 + 1, 4)))")
      .as("bands"))
    assert(fused.exceptAll(sql).isEmpty && sql.exceptAll(fused).isEmpty)
  }

  test("graft_simhash equals the grouped md5-bitsum SQL formulation") {
    graft.functions.VectorExpressions.register(spark)
    val docs = graft.sources.Tables.t(spark, sfDir, "documents")
    val fast = docs.select(col("doc_id"), expr("graft_simhash(split(text, ' '))").as("simhash"))
    // Round-3 reference formulation: explode tokens, group by md5-derived
    // 60-bit hash with multiplicities, 60 signed bit sums, assemble bits.
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"),
        expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .agg(count(lit(1)).as("w"))
    val bitCols = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("w")).otherwise(-col("w"))).as(s"s$i")
    }
    val ref = toks.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(i => when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce((a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
            a.bitwiseOR(b)).as("simhash"))
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty)
  }

  test("simhash: identical text yields identical signature, near-dups land within radius") {
    val pairs = ops.Dedup.q53Simhash(spark, sfDir)
      .select("id1", "id2", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.forall(_._3 <= 3))
    // Planted Jaccard near-dups (J>=0.8, ~99% shared tokens) must largely
    // surface as simhash near-dups too.
    val jacc = ops.Dedup.q51DedupJaccard(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val sim = pairs.map(p => (p._1, p._2)).toSet
    assert(jacc.nonEmpty && (jacc & sim).size * 2 >= jacc.size,
      s"simhash found ${(jacc & sim).size} of ${jacc.size} planted near-dups")
  }

  test("hot-shingle df-cap keeps the inverted-index join balanced (config-gated)") {
    // 80 docs all opening with the same stop-phrase (3 hot shingles with
    // df=80 -> 3·C(80,2) = 9480 one-reducer candidate rows uncapped), plus
    // one planted near-dup pair sharing a long rare tail.
    val stop = "as a matter of fact"
    val docs = ((0 until 80).map(i => (i.toLong, s"$stop unique$i alpha$i beta$i gamma$i"))
      ++ Seq((100L, s"the quick brown fox jumps over the lazy dog again and again"),
             (101L, s"the quick brown fox jumps over the lazy dog again and anew")))
      .toDF("doc_id", "text")

    val uncapped = ops.Dedup.shingles(docs)
    val capped = ops.Dedup.shingles(docs, maxDf = Some(10L))
    val maxDfOf = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy("shingle").count().agg(max("count")).as[Long].head()
    assert(maxDfOf(uncapped) == 80L) // the planted skew is real
    assert(maxDfOf(capped) <= 10L)   // and the cap removes it at the source

    // Default-off path unchanged; capped path still finds the planted pair
    // (its similarity lives in rare shingles) and nothing stop-phrase-only.
    val cappedPairs = ops.Dedup.jaccardNearDups(docs, maxShingleDf = Some(10L))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(cappedPairs == Set((100L, 101L)), cappedPairs)
    val cappedMinhash = ops.Dedup.minhashNearDups(docs, maxShingleDf = Some(10L))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(cappedMinhash == Set((100L, 101L)), cappedMinhash)
  }

  /** The retired round-1 q54: exact all-pairs cosine — a corpus×corpus
    * cartesian, demoted to this recall baseline (VERDICT r1 item 5). Only
    * tests may pay this plan.
    */
  private def exactNeardupAllPairs = {
    graft.functions.VectorExpressions.register(spark)
    val e = graft.sources.Tables.t(spark, sfDir, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        expr("graft_dot(a.emb, b.emb)").as("cosine"))
      .filter(col("cosine") >= 0.45)
  }

  test("raising LSH bits-per-table strictly shrinks the verified near-dup set") {
    graft.functions.VectorExpressions.register(spark)
    val e = graft.sources.Tables.t(spark, sfDir, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val fine = ops.Dedup.embeddingNearDups(e, bitsPerTable = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val coarse = ops.Dedup.embeddingNearDups(e, bitsPerTable = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // An 8-bit table is the concatenation of two 4-bit tables, so an
    // 8-bit collision implies both 4-bit collisions: candidates (and the
    // verified result) can only shrink as bits rise.
    assert(coarse.subsetOf(fine), s"8-bit result not a subset: ${coarse -- fine}")
    assert(fine.nonEmpty)
  }

  test("multi-probe r=8 candidates sandwich between plain r=8 and r=4; recall superset") {
    graft.functions.VectorExpressions.register(spark)
    val e = graft.sources.Tables.t(spark, sfDir, "embeddings").select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    def cands(bits: Int, mp: Boolean) = ops.Dedup.embeddingCandidates(e, bits, mp)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val c4 = cands(4, mp = false)
    val c8 = cands(8, mp = false)
    val c8mp = cands(8, mp = true)
    // Home bucket is in its own probe set -> plain r=8 candidates survive.
    assert(c8.subsetOf(c8mp), s"r=8 candidates lost by probing: ${c8 -- c8mp}")
    // A one-bit mismatch in an 8-bit table leaves one 4-bit half agreeing
    // fully, so every probed candidate is also an r=4 candidate.
    assert(c8mp.subsetOf(c4), s"probed candidates outside r=4: ${c8mp -- c4}")
    assert(c8mp.size >= c8.size && c8mp.size <= c4.size)
    // Verified results inherit the containment (verify is a pure filter).
    val r8 = ops.Dedup.embeddingNearDups(e, bitsPerTable = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val r8mp = ops.Dedup.embeddingNearDups(e, bitsPerTable = 8, multiProbe = true)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(r8.subsetOf(r8mp), s"multi-probe lost verified pairs: ${r8 -- r8mp}")
  }

  test("r=11 floor-division geometry (q143): candidates within r=4's, non-vacuous at sf0.1") {
    graft.functions.VectorExpressions.register(spark)
    // sf0.1, not the spec default sf0.001: the 11-bit posture exists for
    // big corpora and is vacuously empty on 50 vectors. At 2000 vectors it
    // must produce pairs (the registered q143 returns 5 at this SF).
    val e = graft.sources.Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val c11 = ops.Dedup.embeddingCandidates(e, 11, multiProbe = false)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val c4 = ops.Dedup.embeddingCandidates(e, 4, multiProbe = false)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // Any 11 consecutive planes contain at least one ALIGNED 4-plane
    // block (11 >= 4 + 3 + 4), so an 11-bit table collision implies some
    // r=4 table collision: the floor-division geometry still only
    // SHRINKS the candidate set vs the default — no novel candidates.
    assert(c11.nonEmpty, "r=11 produced zero candidates at sf0.1 — vacuous posture")
    assert(c11.subsetOf(c4), s"r=11 candidates outside r=4: ${c11 -- c4}")
    // And the registered query itself is non-empty at the bench SF.
    val verified = ops.Dedup.q143EmbeddingNeardupR11(spark, "/root/testdata/sf0.1")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(verified.nonEmpty)
  }

  test("embedding near-dup (LSH-bucketed q54): subset of exact, recall pinned") {
    val exact = exactNeardupAllPairs
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = ops.Dedup.q54EmbeddingNeardup(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // verify step is exact -> no false positives
    assert(exact.nonEmpty)
    // This corpus is deliberately threshold-grazing (true pairs at cos
    // ~0.4502): expected collision prob per pair 1-(1-0.649^4)^16 ~ 0.96
    // under the deterministic seed-7 planes. Pin a safe floor.
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall > 0.7, s"q54 LSH recall $recall vs exact all-pairs")
  }

  test("semantic dedup (q107): sound vs exact all-pairs, scoped to shared cells") {
    val exact = exactNeardupAllPairs
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val sem = ops.Similarity.q107SemanticDedup(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // The exact cosine verify means every emitted pair is a true pair
    // (no false positives); cell scoping means it may miss cross-cell
    // pairs — soundness is the invariant, recall is the dial.
    assert(sem.nonEmpty, "planted near-dup pairs should land in one cell")
    assert(sem.subsetOf(exact), s"q107 emitted non-pairs: ${sem -- exact}")
    // The corpus-growth geometry (q111, 256 cells) must stay sound too —
    // finer cells change WHICH pairs share a cell, never pair truth.
    val scaled = ops.Similarity.q111SemanticDedupScaled(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(scaled.nonEmpty && scaled.subsetOf(exact),
      s"q111 emitted non-pairs: ${scaled -- exact}")
  }

  test("ANN LSH results are a subset of brute-force rankings' pairs with decent recall") {
    val exact = ops.Similarity.q55AnnBruteforce(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = ops.Similarity.q56AnnLsh(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // 16 tables x 4 bits: expected recall ~0.97 at cos 0.5 on this
    // near-uniform corpus (see q56 scaladoc); assert a safe floor.
    assert(lsh.nonEmpty)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall > 0.5, s"LSH recall $recall vs exact top-5")
  }

  test("multi-probe LSH recall dominates single-probe (strict candidate superset)") {
    val exact = ops.Similarity.q55AnnBruteforce(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val single = ops.Similarity.q56AnnLsh(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val multi = ops.Similarity.q84AnnMultiprobe(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rs = (single & exact).size.toDouble / exact.size
    val rm = (multi & exact).size.toDouble / exact.size
    assert(rm >= rs, s"multiprobe recall $rm < single-probe $rs")
    assert(rm > 0.6, s"multiprobe recall $rm too low")
  }

  test("quantized rescore (q87): int8 shortlist keeps LSH top-5 recall vs brute force") {
    val exact = ops.Similarity.q55AnnBruteforce(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = ops.Similarity.q56AnnLsh(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = ops.Similarity.q87AnnQuantRescore(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // The int8 shortlist (top-10 by integer dot) + exact rerank stays
    // close to the same-candidate float pipeline (q56): 127 quantization
    // levels over 64 dims rank the 10-deep shortlist nearly perfectly
    // (measured 0.88 at sf0.001 — per-neighbor scale loss s_n moves a
    // few sub-threshold candidates past true top-5 members), and the
    // exact rerank restores order within the kept list.
    val vsLsh = (quant & lsh).size.toDouble / lsh.size
    assert(vsLsh >= 0.85, s"q87 overlap with q56 top-5 = $vsLsh")
    // And end-to-end recall vs the exact brute force stays at q56's level.
    val vsExact = (quant & exact).size.toDouble / exact.size
    assert(vsExact >= 0.6, s"q87 recall vs exact = $vsExact")
  }

  test("IVF ANN (deterministic Lloyd-step coarse quantizer, nProbe=4/16) has decent recall vs brute force") {
    val exact = ops.Similarity.q55AnnBruteforce(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = ops.Similarity.q58AnnIvf(spark, sfDir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.4, s"IVF recall $recall vs exact top-5")
  }

  test("media phash dedup (q114): every planted byte-exact copy is found at hamming 0") {
    val pairs = ops.Multimodal.q114MediaPhashDedup(spark, sfDir)
      .select("id1", "id2", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.nonEmpty)
    // Byte-identical payloads MUST hash identically — zero hamming, always
    // candidate-generated (all four bands equal).
    val exactIds = graft.sources.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") % 20 === 0).select("doc_id").as[Long].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    exactIds.foreach { id =>
      assert(found.contains((id, id + 100000L)), s"exact copy of doc $id missed")
    }
    val h0 = pairs.filter(p => exactIds.contains(p._1) && p._2 == p._1 + 100000L)
    assert(h0.forall(_._3 == 0L), "byte-exact copy with nonzero hamming")
  }

  test("graft_ahash equals the explode+groupBy aHash formulation band-for-band") {
    graft.functions.VectorExpressions.register(spark)
    val docs = graft.sources.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val viaExpr = docs
      .select(col("doc_id"), expr("graft_ahash(text)").as("sig"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, 3), b -> struct(CAST(b AS INT) AS band,
             shiftrightunsigned(sig, CAST(48 - 16 * b AS INT)) & 65535 AS bv))""")).as("x"))
      .select(col("doc_id"), col("x.band"), col("x.bv"))
      .as[(Long, Int, Long)].collect().toSet
    val cells = docs
      .select(col("doc_id"), length(col("text")).as("len"),
        posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
      .select(col("doc_id"), expr("CAST(pos AS BIGINT) * 64 DIV len").as("cell"),
        ascii(col("ch")).cast("long").as("byte"))
      .groupBy(col("doc_id"), col("cell"))
      .agg(sum(col("byte")).as("cs"), count(lit(1)).as("cl"))
    val tot = cells.groupBy(col("doc_id"))
      .agg(sum(col("cs")).as("ts"), sum(col("cl")).as("tl"))
    val viaSql = cells.join(tot, "doc_id")
      .select(col("doc_id"), (col("cell") / 16).cast("int").as("band"),
        when(col("cs") * col("tl") > col("ts") * col("cl"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(15 - cell % 16 AS INT))"))
          .otherwise(lit(0L)).as("w"))
      .groupBy(col("doc_id"), col("band")).agg(sum(col("w")).as("bv"))
      .as[(Long, Int, Long)].collect().toSet
    assert(viaExpr == viaSql)
  }

  test("approx_count_distinct is within 5% of exact at sf0.001") {
    // q16 now carries the bound in-band (within_bound column, asserted TRUE
    // by the DuckDB oracle at sf0.01); re-assert here at the second sf.
    val rows = ops.Aggregates.q16ApproxDistinct(spark, sfDir)
      .select("within_bound").as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity))
  }

  test("exact dedup keeps one representative per distinct content") {
    val kept = ops.Dedup.q50DedupExact(spark, sfDir)
    val total = graft.sources.Tables.t(spark, sfDir, "documents").count()
    assert(kept.agg(sum("n_copies")).as[Long].head() == total)
    assert(kept.select("text_hash").distinct().count() == kept.count())
  }

  test("graft_lsh_buckets equals the 64-literal graft_dot formulation on real embeddings") {
    graft.functions.VectorExpressions.register(spark)
    val e = graft.sources.Tables.t(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb")
    val both = e.selectExpr(
      "vec_id",
      graft.functions.Hyperplanes.sparkBucketsExpr("emb") + " AS fast",
      graft.functions.Hyperplanes.sparkBucketsLiteralExpr("emb") + " AS ref")
    assert(both.where("fast <> ref").count() == 0)
    // And the codegen path actually ran as one expression, not 64.
    val p = both.queryExecution.executedPlan.toString
    assert(p.contains("graft_lsh_buckets"), p)
  }

  test("stub resize emits exactly outW*outH bytes and matches a hand-computed kernel") {
    val r = ops.Multimodal.MediaRecord(5L, "s", "image/fake", 4, 4,
      Array.tabulate[Byte](16)(i => (i + 1).toByte))
    val out = {
      import spark.implicits._
      ops.Multimodal.resizeAll(Seq(r).toDS(), 2, 2).collect().head
    }
    assert(out.resized.length == 4)
    // NN kernel on a 4x4 grid to 2x2: picks (0,0),(0,2),(2,0),(2,2) -> 1,3,9,11
    assert(out.resized.toSeq == Seq[Byte](1, 3, 9, 11))
    assert(out.resized_sum == 24L && out.n_nonzero == 4L)
  }

  test("multimodal stub codec is deterministic and histogram sums to payload length") {
    val r = ops.Multimodal.MediaRecord(1L, "s", "image/fake", 8, 8,
      "hello world".getBytes("UTF-8"))
    val f1 = ops.Multimodal.StubCodec.decode(r)
    val f2 = ops.Multimodal.StubCodec.decode(r)
    assert(f1.histogram.toSeq == f2.histogram.toSeq)
    assert(f1.histogram.sum == r.payload.length)
    assert(f1.n_bytes == 11L)
  }

  test("held-L dial: explicit legacy table count is bucket-identical; wider L extends as a prefix") {
    // The parameterized plane budget (VERDICT r8 item 1) must leave every
    // existing geometry untouched: planesAll's 64-plane prefix is the
    // legacy pool, and table t of ANY L draws planes [t*b, (t+1)*b) — so
    // graft_lsh_buckets(e, 11) == graft_lsh_buckets(e, 11, 5), and the
    // 16-table form extends it with tables 5..15, never rehashing 0..4.
    graft.functions.VectorExpressions.register(spark)
    val H = graft.functions.Hyperplanes
    val rows = graft.sources.Tables.t(spark, sfDir, "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .select(
        expr(H.sparkBucketsExpr("emb", 11)).as("legacy"),
        expr(H.sparkBucketsExpr("emb", 11, 5)).as("explicit5"),
        expr(H.sparkBucketsExpr("emb", 11, 16)).as("wide"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val legacy = r.getSeq[Int](0)
      assert(legacy.size == 5)
      assert(legacy == r.getSeq[Int](1),
        "explicit numTables=⌊64/b⌋ must equal the 2-arg legacy form")
      val wide = r.getSeq[Int](2)
      assert(wide.size == 16)
      assert(wide.take(5) == legacy,
        "held-L tables must extend the legacy pool as a prefix")
    }
  }

  test("planted-survivor fixture: high-bit postures return the clone pairs at EVERY SF") {
    // VERDICT r8 item 2: q143/q146 hash-matched on 0 rows at the verify
    // SF — a silently-emptied candidate path would have passed. The
    // planted exact clones (vec_id<3 → +10M) hash into the same bucket in
    // every table at any geometry, so each posture must now emit them —
    // at the SPEC SF (sf0.001, 50 vectors), not just sf0.1.
    graft.functions.VectorExpressions.register(spark)
    val planted = Set((0L, 10000000L), (1L, 10000001L), (2L, 10000002L))
    val postures = Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      ("q143", ops.Dedup.q143EmbeddingNeardupR11 _),
      ("q146", ops.Dedup.q146EmbeddingNeardupR14 _),
      ("q148", ops.Dedup.q148EmbeddingNeardupWide11 _),
      ("q149", ops.Dedup.q149EmbeddingNeardupWide14 _),
      ("q151", ops.Dedup.q151EmbeddingNeardupWide14Mp _),
      ("q152", ops.Dedup.q152EmbeddingNeardupRecall _),
      ("q157", ops.Dedup.q157EmbeddingNeardupWide17 _),
      ("q166", ops.Dedup.q166EmbeddingNeardupWide17Mp _),
      ("q167", ops.Dedup.q167EmbeddingNeardupRecall17 _),
      ("q168", ops.Dedup.q168EmbeddingNeardupWide20 _),
      ("q169", ops.Dedup.q169EmbeddingNeardupRecall20 _))
    postures.foreach { case (name, q) =>
      val got = q(spark, sfDir).select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(planted.subsetOf(got),
        s"$name lost planted clone pairs: ${planted -- got}")
    }
    // And the hierarchical IVF (exact clones follow their original
    // through BOTH assignment levels — identical seed cells and dots).
    val hier = ops.Similarity.q150SemanticDedupHier(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(planted.subsetOf(hier), s"q150 lost planted clone pairs: ${planted -- hier}")
  }

  test("q166 (16x17 + probes) results are a superset of q157's at identical geometry") {
    // One-bit probing only ADDS candidate buckets (home bucket included);
    // the exact cosine verify is a pure filter, so result containment is
    // geometric, not statistical — the same guarantee the q151 ⊇ q149 and
    // q102 ⊇ q101 pins give the lower decades.
    graft.functions.VectorExpressions.register(spark)
    val bare = ops.Dedup.q157EmbeddingNeardupWide17(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val probed = ops.Dedup.q166EmbeddingNeardupWide17Mp(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(probed.nonEmpty && bare.subsetOf(probed),
      s"q166 lost pairs q157 keeps: ${bare -- probed}")
  }

  test("q167 (32x17 + probes) results are a superset of q166's (16x17 + probes)") {
    // Growing L only ADDS tables: q167's first 16 tables draw the SAME
    // plane rows as q166's 16 (indices 0..271, below the reserved PQ
    // block, so lshPlaneRow is the identity there) — every q166 candidate
    // is a q167 candidate, and the exact verify is a pure filter. This
    // pin also exercises the first geometry that routes around the PQ
    // block (tables 27+ use pool rows 512+).
    graft.functions.VectorExpressions.register(spark)
    val mid = ops.Dedup.q166EmbeddingNeardupWide17Mp(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val recall = ops.Dedup.q167EmbeddingNeardupRecall17(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(recall.nonEmpty && mid.subsetOf(recall),
      s"q167 lost pairs q166 keeps: ${mid -- recall}")
  }

  test("q169 (32x20) results are a superset of q168's (16x20)") {
    // Growing L only ADDS tables: q169's first 16 tables draw the SAME
    // plane rows as q168's 16 (indices 0..319, below the reserved PQ
    // block, so lshPlaneRow is the identity there) — every q168 candidate
    // is a q169 candidate, and the exact verify is a pure filter. Tables
    // 23+ route around the block (pool rows 512..703), so this pin also
    // exercises the routed span at 20 bits like the q167 pin does at 17.
    graft.functions.VectorExpressions.register(spark)
    val bare = ops.Dedup.q168EmbeddingNeardupWide20(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val grown = ops.Dedup.q169EmbeddingNeardupRecall20(spark, sfDir)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(grown.nonEmpty && bare.subsetOf(grown),
      s"q169 lost pairs q168 keeps: ${bare -- grown}")
  }
}
