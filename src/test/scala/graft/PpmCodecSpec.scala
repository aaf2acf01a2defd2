package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.{PpmCodec, PpmRecord}

/** Real-byte codec coverage (round 7): the PPM path must behave like a
  * production decode stage — parse genuine headers (whitespace variants,
  * comments), quarantine malformed files instead of throwing, report
  * truncation exactly, and produce re-encodable output.
  */
class PpmCodecSpec extends SparkSpec {

  private def mk(w: Int, h: Int, f: Int => Int, avail: Int): Array[Byte] =
    PpmCodec.encode(w, h, f, avail)

  test("encode → decode round-trips dims, status and exact channel sums") {
    val w = 5; val h = 4
    val bytes = Array.tabulate(w * h * 3)(i => (i * 7 + 3) % 256)
    val d = PpmCodec.decode(mk(w, h, i => bytes(i), w * h * 3))
    assert(d.status == "ok" && d.width == w && d.height == h && d.maxval == 255)
    assert(d.n_pixel_bytes == w * h * 3)
    assert(d.sum_r == bytes.indices.filter(_ % 3 == 0).map(i => bytes(i)).sum)
    assert(d.sum_g == bytes.indices.filter(_ % 3 == 1).map(i => bytes(i)).sum)
    assert(d.sum_b == bytes.indices.filter(_ % 3 == 2).map(i => bytes(i)).sum)
  }

  test("truncated raster is classified, with the exact present-byte count") {
    val d = PpmCodec.decode(mk(4, 3, _ => 10, 17)) // expected 36, present 17
    assert(d.status == "truncated" && d.n_pixel_bytes == 17)
    assert(d.sum_r + d.sum_g + d.sum_b == 170)
  }

  test("bad magic and malformed headers are quarantined, not thrown") {
    assert(PpmCodec.decode("P5\n2 2\n255\n".getBytes ++ Array.fill(12)(1.toByte))
      .status == "bad_magic")
    assert(PpmCodec.decode(Array[Byte]()).status == "bad_magic")
    assert(PpmCodec.decode("P6\nx 2\n255\n".getBytes).status == "bad_header")
    assert(PpmCodec.decode("P6\n2 2\n999\n".getBytes).status == "bad_header")
    // Header claims dims but the file ends at maxval: no data separator.
    assert(PpmCodec.decode("P6\n2 2\n255".getBytes).status == "bad_header")
  }

  test("netpbm header variants parse: comments, multi-whitespace, CRLF") {
    val raster = Array.fill(2 * 2 * 3)(9.toByte)
    val hdr = "P6 # comment after magic\n# full-line comment\n 2\t2 \r\n255\n"
    val d = PpmCodec.decode(hdr.getBytes ++ raster)
    assert(d.status == "ok" && d.width == 2 && d.height == 2)
    assert(d.sum_r + d.sum_g + d.sum_b == 9L * 12)
  }

  test("trailing bytes beyond the raster do not affect features") {
    val w = 2; val h = 2
    val good = mk(w, h, _ => 5, w * h * 3)
    val padded = good ++ Array.fill(40)(99.toByte)
    assert(PpmCodec.decode(padded) == PpmCodec.decode(good))
    // data_off is the PARSED raster start on both: on the padded file a
    // length-derived offset (len - n_pixel_bytes) would point 40 bytes
    // into garbage — the exact bug ADVICE r7 flagged in q142's resize.
    val d = PpmCodec.decode(padded)
    assert(d.data_off == good.length - w * h * 3)
    assert(d.data_off != padded.length - d.n_pixel_bytes.toInt)
  }

  test("ppmTable emits valid PPMs; every doc_id % 17 == 0 file is truncated") {
    val rows = Multimodal.ppmTable(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = PpmCodec.decode(r.ppm)
      val expected = if (r.doc_id % 17 == 0) "truncated" else "ok"
      assert(d.status == expected, s"doc ${r.doc_id}: ${d.status}")
      assert(d.width == r.doc_id % 13 + 4 && d.height == r.doc_id % 11 + 3)
    }
  }

  test("q141 features equal a brute-force recompute from (doc_id, text)") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val out = Multimodal.q141PpmDecode(spark, sfDir).collect()
    assert(out.length == texts.size)
    out.foreach { row =>
      val id = row.getLong(0)
      val text = texts(id)
      val bytes =
        if (text.isEmpty) Array(' '.toByte)
        else Array.tabulate(text.length)(j => (text.charAt(j) & 0x7f).toByte)
      val w = (id % 13 + 4).toInt; val h = (id % 11 + 3).toInt
      val npx = w * h * 3
      val avail = if (id % 17 == 0) npx / 2 else npx
      val sums = new Array[Long](3)
      (0 until avail).foreach(i => sums(i % 3) += bytes(i % bytes.length) & 0xff)
      assert(row.getString(1) == (if (avail < npx) "truncated" else "ok"))
      assert(row.getLong(2) == w && row.getLong(3) == h && row.getLong(4) == avail)
      assert((row.getLong(5), row.getLong(6), row.getLong(7)) == ((sums(0), sums(1), sums(2))))
    }
  }

  test("q142 output PPMs re-decode as valid 8x6 files with matching sums") {
    // The registered query drops the binary column for the oracle; drive
    // the same decode → resize → re-encode path here and re-decode its
    // output — the downstream-stage contract the binary column exists for.
    val media = Multimodal.ppmTable(spark, sfDir)
    import media.sparkSession.implicits._
    val q142 = Multimodal.q142PpmResize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val intact = media.collect().filter(r => PpmCodec.decode(r.ppm).status == "ok")
    assert(intact.nonEmpty && q142.size == intact.length)
    intact.take(25).foreach { r =>
      val d = PpmCodec.decode(r.ppm)
      val dataOff = d.data_off
      val out = new Array[Byte](8 * 6 * 3)
      for (y <- 0 until 6; x <- 0 until 8; c <- 0 until 3) {
        val spx = (y * d.height / 6) * d.width + (x * d.width / 8)
        out((y * 8 + x) * 3 + c) = r.ppm(dataOff + spx * 3 + c)
      }
      val re = PpmCodec.decode(PpmCodec.encode(8, 6, i => out(i) & 0xff, out.length))
      assert(re.status == "ok" && re.width == 8 && re.height == 6)
      assert(q142(r.doc_id) == ((re.sum_r, re.sum_g, re.sum_b)))
    }
  }

  test("raster byte mapping is per CODEPOINT, not UTF-16 code unit (ADVICE r8)") {
    // U+1D11E (musical G clef) is ONE codepoint to DuckDB's
    // length/substring/ascii but TWO surrogate code units to charAt; the
    // raster source must follow the codepoint view so the q141/q142
    // oracle parity holds beyond the BMP. 0x1D11E & 0x7f = 0x1E.
    assert(ops.Multimodal.rasterBytes("𝄞").toSeq == Seq(0x1e.toByte))
    // BMP text unchanged: 'A' -> 0x41, 'é' (U+00E9) -> 0x69.
    assert(ops.Multimodal.rasterBytes("Aé").toSeq == Seq(0x41.toByte, 0x69.toByte))
    // Empty text substitutes a single space (the oracle's len=0 arm).
    assert(ops.Multimodal.rasterBytes("").toSeq == Seq(' '.toByte))
  }
}
