package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Text-analysis operators for training-data curation (north-star surface):
  * language ID, quality scoring, token counting, fingerprinting, tf-idf.
  * All pure Catalyst built-ins (codegen'd, no UDFs); every computation is
  * exact-integer or single-rounded-double so the DuckDB oracle matches.
  *
  * Scale: each query is scan → narrow per-row transforms (+ one shuffle
  * where an aggregate/window needs it). Token explosion multiplies rows by
  * ~avg-doc-length; at 100 TB the explode output never materializes — it
  * flows straight into the partial aggregate.
  */
object TextAnalysis {

  /** Stopword-profile language ID (n-gram heuristic): score each candidate
    * language by its marker-token hits, pick the argmax (ties → language
    * name ascending — deterministic). On this synthetic corpus every doc
    * shares one vocabulary, so the *accuracy* is meaningless — the operator
    * under test is the scoring/argmax machinery, reported as a confusion
    * matrix (true lang × predicted) that the oracle reproduces exactly.
    */
  def q60Langid(s: SparkSession, dir: String): DataFrame = {
    val markers = Map(
      "en" -> Seq("the", "a", "of", "and", "fast"),
      "es" -> Seq("el", "la", "de", "y", "que"),
      "de" -> Seq("der", "die", "und", "ist", "das"),
      "fr" -> Seq("le", "la", "et", "les", "des"),
      "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))
    val docs = t(s, dir, "documents").withColumn("toks", split(col("text"), " "))
    val scoreCols = markers.toSeq.sortBy(_._1).map { case (lang, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      expr(s"size(filter(toks, t -> t IN ($inList)))").as(s"sc_$lang")
    }
    val scored = docs.select((col("doc_id") +: col("lang").as("true_lang") +: scoreCols): _*)
    val langs = markers.keys.toSeq.sorted
    val best = langs.map(l => s"sc_$l").mkString("greatest(", ", ", ")")
    val pred = langs.foldRight("'und'") { (l, els) => s"IF(sc_$l = $best AND $best > 0, '$l', $els)" }
    scored
      .withColumn("pred_lang", expr(pred))
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  val q60Sql: String = {
    val markers = Map(
      "en" -> Seq("the", "a", "of", "and", "fast"),
      "es" -> Seq("el", "la", "de", "y", "que"),
      "de" -> Seq("der", "die", "und", "ist", "das"),
      "fr" -> Seq("le", "la", "et", "les", "des"),
      "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))
    val langs = markers.keys.toSeq.sorted
    val scoreExprs = langs.map { l =>
      val inList = markers(l).map(w => s"'$w'").mkString(", ")
      s"len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS sc_$l"
    }.mkString(", ")
    val best = langs.map(l => s"sc_$l").mkString("greatest(", ", ", ")")
    val pred = langs.foldRight("'und'") { (l, els) => s"IF(sc_$l = $best AND $best > 0, '$l', $els)" }
    s"""WITH scored AS (SELECT doc_id, lang AS true_lang, $scoreExprs FROM documents)
        SELECT true_lang, $pred AS pred_lang, COUNT(*) AS n
        FROM scored GROUP BY 1, 2 ORDER BY true_lang, pred_lang"""
  }

  /** Quality scoring: length, mean token length, type/token ratio, stopword
    * ratio — the classic cheap curation features. All ratios are exact
    * integer divisions done once in DOUBLE, then a linear score. Per-row
    * only: no shuffle except the final presentation sort.
    */
  def q61Quality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_types", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop", expr("CAST(size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT)"))
      .select(
        col("doc_id"), col("n_chars"), col("n_toks"),
        (col("n_chars").cast("double") / col("n_toks")).as("mean_tok_len"),
        (col("n_types").cast("double") / col("n_toks")).as("type_token_ratio"),
        (col("n_stop").cast("double") / col("n_toks")).as("stop_ratio"),
        (col("n_toks") >= 20 && col("n_toks") <= 1000 &&
          col("n_types").cast("double") / col("n_toks") >= 0.2).as("keep"))
      .orderBy(col("doc_id"))

  val q61Sql: String =
    """WITH f AS (SELECT doc_id, n_chars,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_types,
                CAST(len(list_filter(string_split(text, ' '),
                     t -> t IN ('the', 'a', 'of', 'and', 'in'))) AS BIGINT) AS n_stop
         FROM documents)
       SELECT doc_id, n_chars, n_toks,
              CAST(n_chars AS DOUBLE) / n_toks AS mean_tok_len,
              CAST(n_types AS DOUBLE) / n_toks AS type_token_ratio,
              CAST(n_stop AS DOUBLE) / n_toks AS stop_ratio,
              (n_toks >= 20 AND n_toks <= 1000 AND CAST(n_types AS DOUBLE) / n_toks >= 0.2) AS keep
       FROM f ORDER BY doc_id"""

  /** Token counting two ways: whitespace split and a BPE-ish regex
    * tokenizer (letter runs / digit runs / single other-glyph) — the cheap
    * proxy for "how many tokens will the trainer see". Both engines run
    * the same regex (RE2-compatible pattern, no engine-specific syntax).
    */
  def q62TokenStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        expr("CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT)").as("bpe_tokens"),
        (length(col("text")).cast("double") /
          expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")).as("chars_per_token"))
      .orderBy(col("doc_id"))

  val q62Sql: String =
    """SELECT doc_id,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
              CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens,
              CAST(LENGTH(text) AS DOUBLE) / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS chars_per_token
       FROM documents ORDER BY doc_id"""

  /** Rolling-hash document fingerprint: position-weighted polynomial over
    * per-token integer features, all mod 2^31−1 in exact 64-bit integer
    * arithmetic (base 5^(pos mod 8) ≤ 78125, token feature < 2^31 → no
    * overflow, engine-identical). The fingerprint is stable under content
    * equality and cheap to compare — the primitive behind shard-level
    * dedup manifests.
    */
  def q63Fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("tf", pmod(length(col("tok")).cast("long") * 2654435761L +
        ascii(substring(col("tok"), 1, 1)).cast("long") * 97L, lit(2147483647L)))
      .groupBy(col("doc_id"))
      // pmod applied per term BEFORE the sum: keeps every addend < 2^31 so
      // the BIGINT sum stays exact to ~4e9 tokens/doc (Spark sums in
      // 64-bit; DuckDB promotes to HUGEINT — without the reduction the
      // engines would diverge past ~55k tokens).
      .agg(pmod(sum(pmod(col("tf") * expr("CAST(pow(5, pos % 8) AS BIGINT)"), lit(2147483647L))),
        lit(2147483647L)).as("fingerprint"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"))

  val q63Sql: String =
    """WITH toks AS (
         SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
                unnest(string_split(text, ' ')) AS tok
         FROM documents)
       SELECT doc_id,
              CAST((SUM((((LENGTH(tok) * 2654435761 + ascii(substring(tok, 1, 1)) * 97) % 2147483647)
                   * CAST(pow(5, pos % 8) AS BIGINT)) % 2147483647)) % 2147483647 AS BIGINT) AS fingerprint,
              COUNT(*) AS n_tokens
       FROM toks GROUP BY doc_id ORDER BY doc_id"""

  /** tf-idf top-3 terms per document: explode → tf per (doc, term), df per
    * term, idf = ln((N+1)/(df+1)) on exact integer inputs, score rounded
    * once. The df side is term-cardinality-sized → broadcast; N is a
    * single-row aggregate broadcast into the scoring join (round 1 computed
    * it with a driver-side `docs.count()` action — same value, but an extra
    * blocking job and a plan the optimizer can't see through; now the whole
    * query is one lazy plan). Per-doc top-3 via row_number (WindowGroupLimit
    * prunes early).
    */
  def q64Tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n"))
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log((col("n") + 1).cast("double") / (col("df") + 1)), 6))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("rank").cast("long").as("rank"), col("term"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  val q64Sql: String =
    """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
       df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
       n AS (SELECT COUNT(*) AS n FROM documents),
       scored AS (
         SELECT doc_id, term,
                ROUND(tf * LN(CAST(n + 1 AS DOUBLE) / (df + 1)), 6) AS score
         FROM tf JOIN df USING (term), n)
       SELECT doc_id, rank, term, score FROM (
         SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term ASC) AS BIGINT) AS rank
         FROM scored)
       WHERE rank <= 3 ORDER BY doc_id, rank"""

  /** Character 3-gram profile (the classic language/script fingerprint
    * primitive): global top-20 trigrams by frequency.
    *
    * Round-6 posture (reversing the round-4 "char-explode bound" negative
    * result): [[graft.functions.CharTrigramsExpr]] emits the whole per-doc
    * trigram histogram per row, so the scan produces one row per DISTINCT
    * trigram per doc instead of one per character position, and the only
    * shuffle is the global (trigram) partial agg. `sum` over per-doc
    * counts == `count` over positions, so the oracle is unchanged.
    */
  def q65CharNgrams(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.functions.VectorExpressions.register(docs.sparkSession)
    docs
      .select(explode(expr("graft_char_trigrams(text)")).as(Seq("trigram", "c")))
      .groupBy(col("trigram"))
      .agg(sum(col("c")).as("n"))
      .orderBy(col("n").desc, col("trigram").asc)
      .limit(20)
  }

  val q65Sql: String =
    """SELECT trigram, COUNT(*) AS n
       FROM (SELECT substring(text, i, 3) AS trigram
             FROM documents, UNNEST(generate_series(1, greatest(LENGTH(text) - 2, 0))) AS t(i))
       GROUP BY trigram ORDER BY n DESC, trigram ASC LIMIT 20"""

  /** Structured JSON parse: from_json with an explicit schema into a
    * struct column — the at-scale alternative to q33's per-field
    * get_json_object (one parse per row instead of one per extracted
    * field, and the struct prunes). Same relational result as q33's
    * oracle shape, over the parsed struct.
    */
  def q67FromJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
      .select(col("event_type"), col("p.k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q67Sql: String =
    """SELECT event_type,
              COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
              CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
              MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
              MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
       FROM events GROUP BY event_type ORDER BY event_type"""

  /** Token-rarity scoring — the exact-arithmetic stand-in for perplexity
    * filtering (CCNet-style): score each document by the corpus frequency
    * of its tokens. avg_tok_freq = Σ corpus-count(token) / n, computed as
    * an exact BIGINT sum with ONE final division (order-independent, no
    * libm) — deliberately avoids the ln() a real LM score would use, whose
    * per-token rounding would be engine-divergent under summation. Low
    * scores flag rare-token/OOV-heavy documents; rare_tokens counts tokens
    * seen ≤ 5 times corpus-wide. The frequency table is term-cardinality-
    * sized → broadcast.
    */
  def q72RarityScore(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    toks.join(broadcast(freq), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        (sum(col("cnt")).cast("double") / count(lit(1))).as("avg_tok_freq"),
        min(col("cnt")).as("rarest"),
        sum(when(col("cnt") <= 5, 1L).otherwise(0L)).as("rare_tokens"))
      .orderBy(col("doc_id"))
  }

  val q72Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
       SELECT doc_id, COUNT(*) AS n_toks,
              CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_tok_freq,
              MIN(cnt) AS rarest,
              CAST(SUM(CASE WHEN cnt <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS rare_tokens
       FROM toks JOIN freq USING (tok)
       GROUP BY doc_id ORDER BY doc_id"""

  /** Vocabulary build with coverage — the tokenizer-training prep step:
    * global token counts, top-100 by frequency (count desc, token asc),
    * each with its rank and the CUMULATIVE fraction of the corpus the
    * vocabulary covers up to that rank (the curve that picks vocab size).
    *
    * Scale shape: one partial-aggregated count shuffle over tokens; the
    * corpus-total is a one-row aggregate broadcast into the plan (q64's
    * no-driver-action idiom); TakeOrderedAndProject cuts to 100 rows
    * BEFORE the running-sum window, so the only sequential window in the
    * plan is over ≤ 100 rows regardless of corpus size.
    */
  def q98VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(100)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("token").asc)).cast("long"))
      .withColumn("cum_coverage", round(
        sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("token").asc)
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow))
          .cast("double") / col("total"), 6))
      .select(col("rank"), col("token"), col("cnt"), col("cum_coverage"))
      .orderBy(col("rank"))
  }

  val q98Sql: String =
    """WITH c AS (SELECT tok AS token, COUNT(*) AS cnt
               FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
               GROUP BY 1),
       total AS (SELECT SUM(cnt) AS total FROM c),
       top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token ASC LIMIT 100)
       SELECT CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank, token, cnt,
              ROUND(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                    / total, 6) AS cum_coverage
       FROM top, total
       WINDOW w AS (ORDER BY cnt DESC, token ASC)
       ORDER BY rank"""

  /** Domain-shift report — per-source KL divergence of the source's token
    * distribution from the whole-corpus distribution, the standard
    * diagnostic behind data-mixing weights ("which sources look least like
    * the mix"). KL(p_src ‖ p_corpus) = Σ_t p·ln(p/q) over the source's
    * tokens (every source token exists in the corpus, so q > 0 always).
    *
    * Determinism: a double Σ over tokens is partition-order-dependent, so
    * each term is quantized to micro-nats (round(term·1e6) as BIGINT) and
    * summed EXACTLY — q59's fixed-point idiom — making the metric
    * bit-identical under any partitioning and across engines (the metric
    * is defined as the quantized sum; at 1e-6 resolution the quantization
    * is far below any decision threshold a mixing policy would use).
    *
    * Scale shape: one (source, token) partial-agg shuffle; the global
    * token distribution derives from the SAME aggregate (no second corpus
    * pass); token-cardinality-sized frames broadcast; corpus total is a
    * one-row broadcast scalar.
    */
  def q99DomainShift(s: SparkSession, dir: String): DataFrame = {
    val srcCnt = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("c_st"))
    val srcTot = srcCnt.groupBy(col("source")).agg(sum(col("c_st")).as("t_s"))
    val glbCnt = srcCnt.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
    val glbTot = srcCnt.agg(sum(col("c_st")).as("t_g"))
    srcCnt
      .join(broadcast(glbCnt), "token")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(glbTot))
      .withColumn("p", col("c_st").cast("double") / col("t_s"))
      .withColumn("q", col("c_t").cast("double") / col("t_g"))
      .withColumn("micro_nats",
        round(col("p") * log(col("p") / col("q")) * 1e6).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("t_s")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens"),
        (sum(col("micro_nats")).cast("double") / 1e6).as("kl_nats"))
      .orderBy(col("source"))
  }

  val q99Sql: String =
    """WITH sc AS (SELECT source, tok AS token, COUNT(*) AS c_st
               FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
               GROUP BY 1, 2),
       st AS (SELECT source, SUM(c_st) AS t_s FROM sc GROUP BY 1),
       gc AS (SELECT token, SUM(c_st) AS c_t FROM sc GROUP BY 1),
       gt AS (SELECT SUM(c_st) AS t_g FROM sc),
       terms AS (
         SELECT sc.source, st.t_s,
                CAST(ROUND((CAST(c_st AS DOUBLE) / t_s)
                     * LN((CAST(c_st AS DOUBLE) / t_s) / (CAST(c_t AS DOUBLE) / t_g))
                     * 1e6) AS BIGINT) AS micro_nats
         FROM sc JOIN gc USING (token) JOIN st USING (source), gt)
       SELECT source, CAST(MAX(t_s) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct_tokens,
              CAST(SUM(micro_nats) AS DOUBLE) / 1e6 AS kl_nats
       FROM terms GROUP BY source ORDER BY source"""

  /** BPE merge-candidate table — tokenizer-prep step 2 (q98 builds the
    * unigram vocab; this ranks the pair-merge candidates a byte-pair /
    * word-pair tokenizer would greedily merge first): global counts of
    * ADJACENT token pairs, top-20 by frequency with deterministic
    * tie-break. Same scale shape as q98: per-row pair explode → one
    * partial-aggregated count shuffle → TakeOrderedAndProject.
    */
  def q100BpeMerges(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(explode(expr(
        """IF(size(toks) >= 2,
              transform(sequence(1, size(toks) - 1),
                        i -> struct(element_at(toks, i) AS tok1,
                                    element_at(toks, i + 1) AS tok2)),
              array())""")).as("pr"))
      .groupBy(col("pr.tok1").as("tok1"), col("pr.tok2").as("tok2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok1").asc, col("tok2").asc)
      .limit(20)

  val q100Sql: String =
    """SELECT toks[i] AS tok1, toks[i+1] AS tok2, COUNT(*) AS cnt
       FROM (SELECT string_split(text, ' ') AS toks FROM documents),
            UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS t(i)
       GROUP BY 1, 2 ORDER BY cnt DESC, tok1 ASC, tok2 ASC LIMIT 20"""

  /** PII scrub — the redaction pass every public-corpus curation run
    * applies before training: detect and mask email addresses and phone
    * numbers, reporting per-document match counts and the md5 of the
    * scrubbed text (so the oracle verifies the exact redacted bytes
    * without shipping them). The synthetic corpus carries no PII, so a
    * deterministic fixture injection (keyed on doc_id, the identical
    * expression in both engines) plants addresses/numbers for the
    * scrubber to find — the operator under test is the regex machinery.
    * Patterns are RE2-compatible (no backrefs/lookaround), so the DuckDB
    * oracle runs them verbatim; Spark executes them as codegen'd
    * regexp_count/regexp_replace.
    *
    * Scale shape: per-row scan → regex → md5, zero shuffles (the ORDER BY
    * is presentation) — the pass pipelines inside whole-stage codegen
    * behind whatever scan feeds it.
    */
  def q106PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
    t(s, dir, "documents")
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
      .select(col("doc_id"),
        regexp_count(col("pii_text"), lit(emailRe)).as("n_emails"),
        regexp_count(col("pii_text"), lit(phoneRe)).as("n_phones"),
        md5(regexp_replace(regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").cast("binary")).as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: identical injection (VARCHAR casts), identical patterns.
    * DuckDB's regexp_replace is first-match-only by default — the 'g'
    * flag makes it replace-all like Spark's; match counts come from
    * len(regexp_extract_all) since DuckDB has no regexp_count.
    */
  val q106Sql: String =
    """WITH pii AS (
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                     THEN concat(text, ' reach user', CAST(doc_id AS VARCHAR),
                                 '@mail.example.com or x', CAST(doc_id AS VARCHAR),
                                 '@corp.example.org today')
                     WHEN doc_id % 3 = 1
                     THEN concat(text, ' call 555-',
                                 lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-',
                                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'), ' now')
                     ELSE text END AS pii_text
         FROM documents)
       SELECT doc_id,
              len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
              len(regexp_extract_all(pii_text, '\d{3}-\d{3}-\d{4}')) AS n_phones,
              md5(regexp_replace(regexp_replace(pii_text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                  '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS scrubbed_md5
       FROM pii ORDER BY doc_id"""

  /** Corpus bigram log-likelihood score — the CCNet/KenLM-style
    * perplexity-proxy quality filter with the corpus itself as the LM:
    * P(w2|w1) = C(w1,w2) / C(w1,·) over adjacent-token bigrams, each
    * document scored by its mean log-probability (low = incoherent /
    * outlier token sequences; complements q72's unigram rarity). Every
    * scored bigram is by construction in the model, so no smoothing mass
    * is needed. Each term's ln lands ONCE in micro-nats (BIGINT) before
    * the per-document SUM — the q99 fixed-point trick, making a mean of
    * logs deterministic cross-engine under any aggregation order.
    *
    * Scale shape: one partial-aggregated bigram-count shuffle builds the
    * model; C(w1,·) is a second partial agg over the MODEL (vocab²-bounded),
    * not the corpus; scoring joins instances to the model on (w1,w2) —
    * broadcast here, plain hash join when the vocab outgrows it. Documents
    * with fewer than two tokens have no bigrams and drop out in both
    * engines (inner-join semantics).
    */
  def q110BigramScore(s: SparkSession, dir: String): DataFrame = {
    val bi = t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 2
                THEN transform(sequence(1, size(toks) - 1),
                               i -> struct(toks[i - 1] AS w1, toks[i] AS w2))
                ELSE CAST(array() AS array<struct<w1: string, w2: string>>) END"""))
        .as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val cnt2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val cnt1 = cnt2.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    bi.join(broadcast(cnt2), Seq("w1", "w2"))
      .join(broadcast(cnt1), Seq("w1"))
      .withColumn("micro",
        round(log(col("c12").cast("double") / col("c1")) * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("micro")).cast("double") / count(lit(1)) / 1e6, 6).as("avg_logprob_r"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: same bigrams (generate_series(1, len-1) clipped at 0 — empty
    * in DuckDB, never descending), same micro-nat rounding per term.
    */
  val q110Sql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       bi AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
              FROM d, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS t(i)),
       cnt2 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2),
       cnt1 AS (SELECT w1, SUM(c12) AS c1 FROM cnt2 GROUP BY 1),
       scored AS (SELECT doc_id,
                         CAST(ROUND(ln(CAST(c12 AS DOUBLE) / c1) * 1000000) AS BIGINT) AS micro
                  FROM bi JOIN cnt2 USING (w1, w2) JOIN cnt1 USING (w1))
       SELECT doc_id, COUNT(*) AS n_bigrams,
              ROUND(CAST(SUM(micro) AS DOUBLE) / COUNT(*) / 1000000, 6) AS avg_logprob_r
       FROM scored GROUP BY doc_id ORDER BY doc_id"""

  /** BM25 ranked retrieval (Robertson–Spärck Jones, k1 = 1.2, b = 0.75)
    * for a fixed 3-term query — the corpus-search primitive a curation
    * team uses to find "documents about X" before eyeballing a filter,
    * and the lexical half of every hybrid (BM25 + ANN) retrieval stack;
    * complements [[q64Tfidf]], which scores terms per document rather
    * than documents per query. idf uses the standard
    * ln((N − df + 0.5)/(df + 0.5) + 1) form (always positive, so
    * stop-heavy corpora like this fixture still rank).
    *
    * Determinism: each per-term contribution is one double expression
    * rounded once to micro-units; per-document scores are exact BIGINT
    * sums of those (order-free, the q99 fixed-point trick), ranking
    * compares the integers, and the single display division happens at
    * the end.
    *
    * Scale: the term filter is a map-side isin on a 3-element literal
    * list applied directly under the explode (no shuffle sees a
    * non-query term), so tf is a partial agg over a tiny stream; df and
    * corpus stats are broadcast scalars; the global top-10 is
    * TakeOrderedAndProject (limit BEFORE the rank window, which then
    * runs over 10 rows), never a corpus-sized single-partition sort.
    */
  /** BM25 micro-unit scores (doc_id, sfx) for `qterms` — the scoring core
    * of q117, exposed for composition (q125's hybrid fusion). The term
    * filter cuts the token stream map-side; df/stats broadcast; only docs
    * containing a query term survive.
    */
  def bm25Scores(docs: DataFrame, qterms: Seq[String]): DataFrame = {
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(qterms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("fx", expr(
        """CAST(ROUND(LN((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                      * (tf * 2.2)
                      / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(tot AS DOUBLE) / n)))
                      * 1000000) AS BIGINT)"""))
      .groupBy(col("doc_id")).agg(sum(col("fx")).as("sfx"))
  }

  def q117Bm25(s: SparkSession, dir: String): DataFrame = {
    bm25Scores(t(s, dir, "documents"), Seq("spark", "merge", "window"))
      .orderBy(col("sfx").desc, col("doc_id").asc).limit(10)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("sfx").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"),
        round(col("sfx").cast("double") / 1000000d, 6).as("score"))
      .orderBy(col("rank"))
  }

  /** Oracle: identical contribution expression (same association order,
    * so both engines execute the same IEEE double ops), same micro-unit
    * rounding, integer ranking.
    */
  val q117Sql: String =
    """WITH dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                   FROM documents),
       stats AS (SELECT COUNT(*) AS n, SUM(dl) AS tot FROM dl),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
              WHERE term IN ('spark', 'merge', 'window') GROUP BY 1, 2),
       df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       c AS (SELECT doc_id,
                    CAST(ROUND(LN((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                               * (tf * 2.2)
                               / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(tot AS DOUBLE) / n)))
                               * 1000000) AS BIGINT) AS fx
             FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats),
       sc AS (SELECT doc_id, SUM(fx) AS sfx FROM c GROUP BY 1),
       ranked AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY sfx DESC, doc_id) AS BIGINT) AS rank,
                         doc_id, ROUND(CAST(sfx AS DOUBLE) / 1000000, 6) AS score
                  FROM sc)
       SELECT rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY rank"""

  /** Hashed linear-classifier quality scoring — the fastText shape every
    * production quality filter uses (CCNet's LM filter, LLaMA's
    * Wikipedia-reference classifier): unigram + bigram features hashed
    * into 4096 buckets, a weight per bucket, mean-pooled margin, sigmoid
    * score, binary keep verdict. The WEIGHTS here are a deterministic
    * stand-in (Knuth multiplicative hash of the bucket id — the trained
    * model isn't shippable in this container, same posture as
    * [[graft.ops.Multimodal.StubCodec]]); the plumbing under test — the
    * feature hashing, the hash-bucket weight lookup as pure arithmetic
    * instead of a 4096-row join, the mean-pooled margin — is exactly what
    * a real exported model runs, with the weight formula swapped for an
    * `element_at` on a broadcast literal array.
    *
    * Determinism: bucket and weight are all-BIGINT (md5 → 32-bit int →
    * Knuth multiply mod 2000001, centered), the margin is an exact
    * integer sum in micro-units, `keep` compares the integer against
    * zero, and the sigmoid is one double expression rounded once.
    *
    * Scale: explode → map (hash + weight arithmetic, no join at all) →
    * partial-aggregated per-doc sum. One corpus shuffle on doc_id; the
    * "model" costs zero bytes of state on any executor.
    */
  /** Library form of [[q118QualityClassifier]]: score any (doc_id, text)
    * frame — batch or STREAMING (explode and the weight arithmetic are
    * stateless per-row; the per-doc aggregation is a standard streaming
    * groupBy, proven in `StreamingSpec`). No presentation sort, so the
    * caller picks output mode/ordering.
    */
  def classifierScore(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """concat(toks,
              IF(size(toks) >= 2,
                 transform(sequence(1, size(toks) - 1),
                           i -> concat(toks[i - 1], ' ', toks[i])),
                 array()))""")).as("f"))
      .select(col("doc_id"), expr(
        "CAST(conv(substring(md5(concat('feat:', f)), 1, 8), 16, 10) AS BIGINT) % 4096").as("b"))
      .select(col("doc_id"), (col("b") * 2654435761L % 2000001L - 1000000L).as("w_fx"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w_fx")).as("margin_fx"))
      .select(col("doc_id"), col("n_feats"), col("margin_fx"),
        round(expr(
          "1.0 / (1.0 + EXP(-(CAST(margin_fx AS DOUBLE) / n_feats / 1000000)))"), 6)
          .as("score_r"),
        (col("margin_fx") > 0).as("keep"))

  def q118QualityClassifier(s: SparkSession, dir: String): DataFrame =
    classifierScore(t(s, dir, "documents").select(col("doc_id"), col("text")))
      .orderBy(col("doc_id"))

  /** Oracle: q80's digit-by-digit md5 bucket with the 'feat:' salt, the
    * identical integer weight formula, and the same single-rounded
    * sigmoid expression (same association order).
    */
  val q118Sql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       feats AS (SELECT doc_id, unnest(toks) AS f FROM d
                 UNION ALL
                 SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS f
                 FROM d, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)),
       w AS (SELECT doc_id,
                    (list_reduce([strpos('0123456789abcdef',
                         substring(md5('feat:' || f), i, 1)) - 1
                        FOR i IN generate_series(1, 8)]::BIGINT[],
                      (a, v) -> a * 16 + v) % 4096)
                    * 2654435761 % 2000001 - 1000000 AS w_fx
             FROM feats),
       agg AS (SELECT doc_id, COUNT(*) AS n_feats, SUM(w_fx) AS margin_fx
               FROM w GROUP BY 1)
       SELECT doc_id, n_feats, CAST(margin_fx AS BIGINT) AS margin_fx,
              ROUND(1.0 / (1.0 + EXP(-(CAST(margin_fx AS DOUBLE) / n_feats / 1000000))), 6)
                AS score_r,
              margin_fx > 0 AS keep
       FROM agg ORDER BY doc_id"""

  /** Character-entropy quality gate — the CCNet/Gopher-family "garbage
    * text" signal the suite doesn't have yet: Shannon entropy of the
    * per-document CHARACTER distribution, H = -Σ p·ln p. Encoding junk,
    * repeated-char padding, and binary-pasted-as-text all crater H, while
    * natural text sits near the language's char entropy (~2.6 nats for
    * space-separated lowercase English), so `low_entropy` flags the
    * degenerate tail a token-level filter misses.
    *
    * Determinism is the q99 micro-nat trick: each char's p·ln p lands
    * ONCE as round(·1e6) BIGINT, the per-doc sum is exact-integer — the
    * only float op (ln of a small rational) is bit-identical cross-engine
    * at micro-rounding.
    *
    * Scale: the char explode multiplies rows by doc length, but flows
    * straight into a (doc_id, ch) partial aggregate (alphabet-bounded per
    * doc, so combine crushes it map-side); doc totals come from the
    * already-tiny per-char counts, not a second scan. One shuffle pair,
    * both on doc_id — no vocabulary-sized state anywhere.
    */
  def charEntropy(docs: DataFrame, lowMicroNats: Long = 2500000L): DataFrame = {
    // Round-6 posture (VERDICT r5 item 4): the whole histogram+entropy is
    // one codegen'd per-row expression — scan → project → sort, zero data
    // shuffles — replacing the row-per-character explode + two aggregate
    // passes + join. Bit-identical output (see CharEntropyExpr scaladoc);
    // the zero-length filter preserves the old "no chars → no row" drop.
    graft.functions.VectorExpressions.register(docs.sparkSession)
    docs
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), expr("graft_char_entropy(text)").as("e"))
      .select(col("doc_id"),
        col("e.n_distinct_chars").as("n_distinct_chars"),
        col("e.ent_micro").as("ent_micro"))
      .withColumn("low_entropy", col("ent_micro") < lowMicroNats)
      .orderBy(col("doc_id"))
  }

  def q123CharEntropy(s: SparkSession, dir: String): DataFrame =
    charEntropy(t(s, dir, "documents"))

  val q123Sql: String =
    """WITH chars AS (
         SELECT doc_id, unnest(string_split_regex(text, '')) AS ch FROM documents),
       chars2 AS (SELECT doc_id, ch FROM chars WHERE len(ch) > 0),
       counts AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM chars2 GROUP BY 1, 2),
       totals AS (SELECT doc_id, SUM(cnt) AS len, COUNT(*) AS n_distinct_chars
                  FROM counts GROUP BY 1),
       terms AS (
         SELECT c.doc_id, t.n_distinct_chars,
                CAST(ROUND(CAST(c.cnt AS DOUBLE) / t.len
                           * ln(CAST(c.cnt AS DOUBLE) / t.len) * 1e6) AS BIGINT) AS micro
         FROM counts c JOIN totals t ON c.doc_id = t.doc_id)
       SELECT doc_id, n_distinct_chars, CAST(-SUM(micro) AS BIGINT) AS ent_micro,
              CAST(-SUM(micro) AS BIGINT) < 2500000 AS low_entropy
       FROM terms GROUP BY doc_id, n_distinct_chars ORDER BY doc_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_char_entropy" -> (q123CharEntropy _),
    "q106_pii_scrub" -> (q106PiiScrub _),
    "q110_bigram_score" -> (q110BigramScore _),
    "q100_bpe_merges" -> (q100BpeMerges _),
    "q99_domain_shift" -> (q99DomainShift _),
    "q98_vocab_coverage" -> (q98VocabCoverage _),
    "q72_rarity_score" -> (q72RarityScore _),
    "q65_char_ngrams" -> (q65CharNgrams _),
    "q67_from_json" -> (q67FromJson _),
    "q60_langid" -> (q60Langid _),
    "q61_quality" -> (q61Quality _),
    "q62_token_stats" -> (q62TokenStats _),
    "q63_fingerprint" -> (q63Fingerprint _),
    "q64_tfidf" -> (q64Tfidf _),
    "q117_bm25_topk" -> (q117Bm25 _),
    "q118_quality_classifier" -> (q118QualityClassifier _))

  val oracle: Map[String, String] = Map(
    "q123_char_entropy" -> q123Sql,
    "q106_pii_scrub" -> q106Sql,
    "q110_bigram_score" -> q110Sql,
    "q100_bpe_merges" -> q100Sql,
    "q99_domain_shift" -> q99Sql,
    "q98_vocab_coverage" -> q98Sql,
    "q72_rarity_score" -> q72Sql,
    "q65_char_ngrams" -> q65Sql,
    "q67_from_json" -> q67Sql,
    "q60_langid" -> q60Sql,
    "q61_quality" -> q61Sql,
    "q62_token_stats" -> q62Sql,
    "q63_fingerprint" -> q63Sql,
    "q64_tfidf" -> q64Sql,
    "q117_bm25_topk" -> q117Sql,
    "q118_quality_classifier" -> q118Sql)
}
