package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables.t

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, decoded/feature-extracted inside executors via
  * typed `mapPartitions` (the JVM-side equivalent of a batched Pandas UDF:
  * one iterator per partition, codec state amortized across the batch,
  * nothing crosses the driver).
  *
  * The actual codec is STUBBED — no image/audio libraries exist in this
  * environment — as `StubCodec.decode`, a deterministic fake that treats
  * the payload bytes as "pixels". Everything around the stub is real and
  * load-bearing: binary column construction, metadata schema, partition
  * iteration, feature schema, and the downstream aggregation. Swapping
  * `StubCodec.decode` for a JNI/javacv call is the only change a real
  * deployment needs.
  *
  * Scale: decode is per-row, embarrassingly parallel, no shuffle until the
  * final small aggregate. Partition sizing (`maxPartitionBytes`) bounds
  * executor memory for large blobs; real deployments store blobs in
  * object storage and keep only (uri, metadata) in the table — the decode
  * stage then streams per-partition downloads through the same iterator.
  */
object Multimodal {

  /** A media row: payload + metadata the pipeline carries alongside. */
  final case class MediaRecord(doc_id: Long, source: String, media_type: String,
                               width: Int, height: Int, payload: Array[Byte])

  /** Decoded features: 16-bucket payload histogram + luminance proxy. */
  final case class MediaFeatures(doc_id: Long, source: String, n_bytes: Long,
                                 histogram: Array[Long], mean_byte: Double)

  object StubCodec {
    /** STUB: a real implementation would decode the image/audio payload
      * (e.g. via a JNI codec) and emit pixel/sample statistics. The fake
      * derives features directly from payload bytes — deterministic, so
      * the pipeline around it is testable end-to-end.
      */
    def decode(r: MediaRecord): MediaFeatures = {
      val hist = new Array[Long](16)
      var sum = 0L
      var i = 0
      while (i < r.payload.length) {
        val b = r.payload(i) & 0xff
        hist(b / 16) += 1
        sum += b
        i += 1
      }
      MediaFeatures(r.doc_id, r.source, r.payload.length.toLong, hist,
        if (r.payload.length == 0) 0.0 else sum.toDouble / r.payload.length)
    }
  }

  /** documents → media table: text bytes stand in for an image payload;
    * width/height are synthesized metadata. In production this is
    * `spark.read.format("binaryFile")` or a parquet table with a BINARY
    * column — same schema from here on.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), lit("image/fake").as("media_type"),
        (pmod(col("doc_id"), lit(64)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 24).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Batched decode: one codec pass per partition iterator. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(StubCodec.decode))
  }

  /** Per-source aggregate over decoded features: histogram summed
    * bucket-wise (explode → group — partial agg collapses map-side) plus
    * byte-volume stats. Oracle-checkable because the stub's features are
    * a pure function of the (ASCII) text bytes.
    */
  def q70MediaFeatures(s: SparkSession, dir: String): DataFrame =
    decodeAll(mediaTable(s, dir)).toDF()
      .select(col("source"), col("n_bytes"), posexplode(col("histogram")).as(Seq("bucket", "n")))
      .groupBy(col("source"), col("bucket").cast("long").as("bucket"))
      .agg(sum(col("n")).as("n_bytes_in_bucket"))
      .filter(col("n_bytes_in_bucket") > 0)
      .orderBy(col("source"), col("bucket"))

  val q70Sql: String =
    """WITH bytes AS (
         SELECT source, ascii(text[i]) AS b
         FROM documents, UNNEST(generate_series(1, LENGTH(text))) AS t(i))
       SELECT source, CAST(b // 16 AS BIGINT) AS bucket, COUNT(*) AS n_bytes_in_bucket
       FROM bytes GROUP BY 1, 2 HAVING COUNT(*) > 0 ORDER BY source, bucket"""

  /** Frame sampling shape: every k-th fixed-size chunk of the payload
    * (video frame-sample dual). Emits (doc_id, frame_no, frame_bytes,
    * checksum); checksum aggregated per source so the result is small and
    * deterministic. The chunking/sampling happens inside the executor on
    * the binary payload — no driver involvement.
    */
  def q71FrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(s, dir)
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frame = 32; val stride = 3 // take every 3rd 32-byte "frame"
      r.payload.grouped(frame).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 =>
          (r.doc_id, idx.toLong, chunk.length.toLong, chunk.map(_ & 0xff).sum.toLong)
      }
    }.toDF("doc_id", "frame_no", "frame_len", "frame_sum")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("frame_sum")).as("payload_sum"))
      .orderBy(col("doc_id"))
  }

  val q71Sql: String =
    """WITH frames AS (
         SELECT doc_id, (i - 1) // 32 AS frame_no, ascii(text[i]) AS b
         FROM documents, UNNEST(generate_series(1, LENGTH(text))) AS t(i)),
       sampled AS (SELECT doc_id, frame_no, SUM(b) AS frame_sum
                   FROM frames WHERE frame_no % 3 = 0 GROUP BY 1, 2)
       SELECT doc_id, COUNT(*) AS n_frames, CAST(SUM(frame_sum) AS BIGINT) AS payload_sum
       FROM sampled GROUP BY doc_id ORDER BY doc_id"""

  /** A resized media row: the resized payload stays a first-class binary
    * column (real plumbing — a downstream stage could re-decode it), with
    * integer checksum features for the oracle.
    */
  final case class ResizedMedia(doc_id: Long, out_w: Int, out_h: Int,
                                resized: Array[Byte], resized_sum: Long,
                                n_nonzero: Long)

  /** Nearest-neighbor resize of the fake w×h "image" to outW×outH — the
    * classic preprocessing kernel, stubbed over payload bytes as pixels
    * (row-major; reads past the payload are zero — the fake metadata's
    * w×h may exceed the byte count, as real truncated files do). The
    * kernel runs inside the partition iterator on the binary column; only
    * the fixed outW×outH bytes per row survive, which is exactly the
    * dataflow of an image-resize stage feeding a training pipeline.
    */
  def resizeAll(media: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val out = new Array[Byte](outW * outH)
      var sum = 0L
      var nz = 0L
      var y = 0
      while (y < outH) {
        val sy = y * r.height / outH
        var x = 0
        while (x < outW) {
          val sx = x * r.width / outW
          val idx = sy * r.width + sx
          val b = if (idx < r.payload.length) r.payload(idx) else 0.toByte
          out(y * outW + x) = b
          sum += (b & 0xff)
          if (b != 0) nz += 1
          x += 1
        }
        y += 1
      }
      ResizedMedia(r.doc_id, outW, outH, out, sum, nz)
    })
  }

  /** Resize stage result, oracle-checked on the integer checksums (the
    * resized payload itself is carried but not hashed — binary columns
    * round-trip differently across engines).
    */
  def q78MediaResize(s: SparkSession, dir: String): DataFrame =
    resizeAll(mediaTable(s, dir), 16, 12).toDF()
      .select(col("doc_id"), col("out_w").cast("long").as("out_w"),
        col("out_h").cast("long").as("out_h"), col("resized_sum"), col("n_nonzero"))
      .orderBy(col("doc_id"))

  /** DuckDB replica: same nearest-neighbor index arithmetic over the same
    * synthesized w×h metadata, bytes via ascii() on the ASCII text.
    */
  val q78Sql: String =
    """WITH px AS (
         SELECT doc_id,
                ((i // 16) * (doc_id % 48 + 24)) // 12 * (doc_id % 64 + 32)
                  + ((i % 16) * (doc_id % 64 + 32)) // 16 AS src,
                LENGTH(text) AS len, text
         FROM documents, UNNEST(generate_series(0, 191)) AS t(i)),
       b AS (SELECT doc_id,
                    CASE WHEN src < len THEN ascii(text[CAST(src + 1 AS INT)]) ELSE 0 END AS byte
             FROM px)
       SELECT doc_id, CAST(16 AS BIGINT) AS out_w, CAST(12 AS BIGINT) AS out_h,
              CAST(SUM(byte) AS BIGINT) AS resized_sum,
              CAST(COUNT(*) FILTER (byte <> 0) AS BIGINT) AS n_nonzero
       FROM b GROUP BY doc_id ORDER BY doc_id"""

  /** Perceptual-hash near-dup over media payloads — the aHash shape
    * (downsample → threshold against the global mean → 64-bit fingerprint
    * → hamming pairs), computed over the stub "pixels" (payload bytes =
    * the document's UTF-8 text, exactly [[mediaTable]]'s payload). This is
    * the multimodal analog of q53's SimHash text dedup: re-encoded or
    * lightly-corrupted copies of the same media land within a small
    * hamming radius while unrelated payloads sit near 32/64.
    *
    * Determinism is total-integer: cell index is exact integer division
    * (pos·64 DIV len), the threshold bit compares cross-multiplied BIGINT
    * sums (cell_sum·total_len > total_sum·cell_len) so no floating-point
    * mean ever exists, and the fingerprint packs into four 16-bit band
    * ints. Candidates come from the SimHash pigeonhole: hamming ≤ 3 over
    * 4 bands forces ≥ 1 identical band — perfect recall, then exact
    * hamming verify.
    *
    * Scale shape: per-char explode → partial-aggregated (doc, cell) sums
    * (64 rows/doc into the agg, q65's shape); candidate generation is an
    * equi self-join on (band, value); verify joins the 4-row band frames
    * of each side. Nothing is all-pairs.
    *
    * Fixture note: the corpus's planted near-dups are token-level edits —
    * the thing SimHash (q53) catches and position-sensitive perceptual
    * hashing deliberately does NOT (measured: their phash hamming is
    * 15–35, indistinguishable from random pairs). What aHash catches is
    * re-encodes/light corruption of the same media, so the fixture plants
    * exactly that, q106-style: every doc_id % 20 == 0 gets a byte-exact
    * copy (hamming 0) and every doc_id % 20 == 10 a 3-byte-corrupted copy
    * (hamming ≤ 3), both under doc_id + 100000, with the identical
    * injection expression in the oracle.
    */
  def q114MediaPhashDedup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val docs = base
      .unionByName(base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") % 20 === 10)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("concat(substring(text, 1, 4), 'zzz', substring(text, 8, length(text)))").as("text")))
    // Whole fingerprint per row (graft_ahash, codegen'd — replaces the
    // per-character explode + two corpus-wide groupBys; the DedupSpec
    // equivalence test pins it band-for-band to the SQL formulation,
    // which the oracle still states). Payloads under 4 code points would
    // emit all-four-bands-zero here where the SQL formulation emits no
    // row for a cell-less band — degenerate "media" outside the
    // fixture's 44-char floor, noted for honesty.
    val bands = docs
      .select(col("doc_id"), expr("graft_ahash(text)").as("sig"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, 3), b -> struct(
             CAST(b AS INT) AS band,
             shiftrightunsigned(sig, CAST(48 - 16 * b AS INT)) & 65535 AS bv))""")).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bv").as("bv"))
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    cands
      .join(bands.as("x"), col("id1") === col("x.doc_id"))
      .join(bands.as("y"), col("id2") === col("y.doc_id") && col("x.band") === col("y.band"))
      .groupBy(col("id1"), col("id2"))
      .agg(sum(expr("bit_count(x.bv ^ y.bv)")).cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy(col("id1"), col("id2"))
  }

  /** Oracle: identical integer-only pipeline (ord() over the ASCII text,
    * same exact-division cells, same cross-multiplied threshold, same
    * band packing, pigeonhole candidates, bit_count verify).
    */
  val q114Sql: String =
    """WITH media AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 100000, text FROM documents WHERE doc_id % 20 = 0
         UNION ALL
         SELECT doc_id + 100000,
                concat(substring(text, 1, 4), 'zzz', substring(text, 8, length(text)))
         FROM documents WHERE doc_id % 20 = 10),
       chars AS (
         SELECT doc_id, ((i - 1) * 64) // length(text) AS cell,
                ord(substring(text, CAST(i AS INT), 1)) AS byte
         FROM media, UNNEST(generate_series(1, length(text))) AS t(i)),
       cells AS (SELECT doc_id, cell, SUM(byte) AS cs, COUNT(*) AS cl
                 FROM chars GROUP BY 1, 2),
       tot AS (SELECT doc_id, SUM(cs) AS ts, SUM(cl) AS tl FROM cells GROUP BY 1),
       bits AS (SELECT c.doc_id, CAST(cell // 16 AS INT) AS band,
                       CASE WHEN cs * tl > ts * cl
                            THEN (CAST(1 AS BIGINT) << CAST(15 - cell % 16 AS INT))
                            ELSE 0 END AS w
                FROM cells c JOIN tot USING (doc_id)),
       bands AS (SELECT doc_id, band, SUM(w) AS bv FROM bits GROUP BY 1, 2),
       cands AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       ham AS (SELECT id1, id2, SUM(bit_count(xor(x.bv, y.bv))) AS h
               FROM cands JOIN bands x ON id1 = x.doc_id
                          JOIN bands y ON id2 = y.doc_id AND x.band = y.band
               GROUP BY 1, 2)
       SELECT id1, id2, CAST(h AS BIGINT) AS hamming FROM ham
       WHERE h <= 3 ORDER BY id1, id2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_media_features" -> (q70MediaFeatures _),
    "q71_frame_sample" -> (q71FrameSample _),
    "q78_media_resize" -> (q78MediaResize _),
    "q114_media_phash_dedup" -> (q114MediaPhashDedup _))

  val oracle: Map[String, String] = Map(
    "q70_media_features" -> q70Sql,
    "q71_frame_sample" -> q71Sql,
    "q78_media_resize" -> q78Sql,
    "q114_media_phash_dedup" -> q114Sql)
}
