package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-5 linkage/text operators beyond the DuckDB
  * hash match: planted-PII accounting and scrub completeness (q106),
  * blocking losslessness for the fuzzy join (q108), log-probability
  * bounds and bigram accounting (q110).
  */
class LinkageTextSpec extends SparkSpec {
  import spark.implicits._

  test("PII scrub (q106): planted counts are exact and no pattern survives the scrub") {
    val out = ops.TextAnalysis.q106PiiScrub(spark, sfDir)
      .select("doc_id", "n_emails", "n_phones").as[(Long, Int, Int)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, ne, np) =>
      val (expE, expP) = (id % 3) match {
        case 0 => (2, 0) // two planted addresses
        case 1 => (0, 1) // one planted number
        case _ => (0, 0) // untouched word soup
      }
      assert(ne == expE && np == expP, s"doc $id counted ($ne,$np), planted ($expE,$expP)")
    }
    // Completeness: rebuild the scrubbed text with the same expressions and
    // assert zero residual matches — the property the md5 alone can't show.
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
    val residual = graft.sources.Tables.t(spark, sfDir, "documents")
      .withColumn("pii_text", expr(
        """CASE WHEN doc_id % 3 = 0
                THEN concat(text, ' reach user', CAST(doc_id AS STRING),
                            '@mail.example.com or x', CAST(doc_id AS STRING),
                            '@corp.example.org today')
                WHEN doc_id % 3 = 1
                THEN concat(text, ' call 555-',
                            lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), '-',
                            lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), ' now')
                ELSE text END"""))
      .withColumn("scrubbed",
        regexp_replace(regexp_replace(col("pii_text"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
      .filter(regexp_count(col("scrubbed"), lit(emailRe)) > 0 ||
        regexp_count(col("scrubbed"), lit(phoneRe)) > 0)
      .count()
    assert(residual == 0, s"$residual documents still carry PII after the scrub")
  }

  test("fuzzy name join (q108): length-band blocking is lossless vs the unblocked join") {
    val blocked = ops.Linkage.q108FuzzyNameJoin(spark, sfDir)
      .select("name1", "name2", "dist").as[(String, String, Int)].collect().toSet
    assert(blocked.nonEmpty)
    assert(blocked.forall { case (n1, n2, d) => n1 < n2 && d <= 4 })
    val names = graft.sources.Tables.t(spark, sfDir, "part")
      .select(col("p_name")).distinct()
    val brute = names.as("a").join(names.as("b"),
        col("a.p_name") < col("b.p_name"))
      .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
      .filter(col("dist") <= 4)
      .select(col("a.p_name"), col("b.p_name"), col("dist"))
      .as[(String, String, Int)].collect().toSet
    assert(blocked == brute,
      s"blocking dropped ${(brute -- blocked).size} pairs / invented ${(blocked -- brute).size}")
  }

  test("bigram score (q110): scores are log-probabilities (<= 0) and bigram counts tie to token counts") {
    val out = ops.TextAnalysis.q110BigramScore(spark, sfDir)
      .select("doc_id", "n_bigrams", "avg_logprob_r").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val toks = graft.sources.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    // Every multi-token document appears with exactly (n_tokens - 1) bigrams.
    toks.foreach { case (id, n) =>
      if (n >= 2) {
        val (nb, avg) = out.getOrElse(id, fail(s"doc $id missing from q110"))
        assert(nb == n - 1, s"doc $id: $nb bigrams from $n tokens")
        // micro-nat rounding can lift an exact-zero term by at most 5e-7
        assert(avg <= 1e-6, s"doc $id: positive mean log-probability $avg")
      } else assert(!out.contains(id), s"doc $id with $n tokens should have no bigrams")
    }
  }
}
