package graft.operators

import graft.{Num, QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A decoded media asset row: the batch shape a real decoder returns.
  * `features` stands in for pixel/audio features. */
final case class DecodedAsset(
    doc_id: Long,
    mime: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    features: Array[Float])

/** A decoded image row: format, real header-parsed dimensions, and an
  * exact integer checksum over the pixel payload. */
final case class DecodedImage(
    doc_id: Long,
    fmt: String,
    width: Int,
    height: Int,
    n_pix_bytes: Long,
    pix_sum: Long)

/** Multimodal column plumbing (SURVEY.md §2B north star): media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The decode kernel is REAL for uncompressed formats: [[decodeImage]]
  * parses PPM (P6, including comment/whitespace header handling) and BMP
  * (BITMAPINFOHEADER 24bpp, including 4-byte row padding) straight from
  * the bytes — header → dimensions, pixel array → exact checksum. The
  * container has no codec libraries, so COMPRESSED formats (JPEG/PNG/...)
  * still route to [[decodeStub]], a clearly-marked deterministic fake.
  * The batch shape is identical for both: per-partition iterators
  * (`mapPartitions`, the Scala analogue of a Pandas-UDF batch) so a real
  * codec binding amortizes its init across the batch.
  *
  * The payload here is synthesized from `documents` (utf8 bytes, or
  * [[encodePpm]]/[[encodeBmp]] fixtures) so the pipeline runs on the
  * standard testdata and stays oracle-checkable.
  */
object Multimodal {

  /** Minimal real PPM (P6) encoder — fixture generator for the decode
    * path. Emits a comment line so the decoder's header handling is
    * exercised by every fixture, not just hand-built edge cases. */
  def encodePpm(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    val header = s"P6\n# graft fixture\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var k = 0
    while (k < w * h * 3) {
      out(header.length + k) = (pix(k) & 0xff).toByte
      k += 1
    }
    out
  }

  /** Minimal real BMP (BITMAPINFOHEADER, 24bpp, bottom-up) encoder with
    * spec-correct 4-byte row padding. */
  def encodeBmp(w: Int, h: Int, pix: Int => Int): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dataOff = 54
    val size = dataOff + rowBytes * h
    val b = new Array[Byte](size)
    def le32(o: Int, v: Int): Unit = {
      b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
      b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, dataOff)
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, w); le32(22, h)
    b(26) = 1 // planes
    b(28) = 24 // bpp
    le32(30, 0) // BI_RGB (uncompressed)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w * 3) {
        b(dataOff + r * rowBytes + c) = (pix(r * w * 3 + c) & 0xff).toByte
        c += 1
      }
      r += 1
    }
    b
  }

  /** Real PPM (P6) parse: header (whitespace + `#` comments per the
    * netpbm spec) → (width, height, maxval), then an exact sum over the
    * w·h·3 pixel bytes. Throws on non-P6 or truncated payloads. */
  def decodePpm(b: Array[Byte]): (Int, Int, Int, Long) = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
    var i = 2
    def skipWs(): Unit = {
      var done = false
      while (!done) {
        while (i < b.length && (b(i) == ' ' || b(i) == '\n'
          || b(i) == '\r' || b(i) == '\t')) i += 1
        if (i < b.length && b(i) == '#') {
          while (i < b.length && b(i) != '\n') i += 1
        } else done = true
      }
    }
    def int(): Int = {
      skipWs()
      require(i < b.length && b(i) >= '0' && b(i) <= '9', "bad PPM header")
      var v = 0
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      v
    }
    val w = int(); val h = int(); val maxv = int()
    i += 1 // exactly one whitespace byte separates maxval from pixels
    val end = i + w * h * 3
    require(end <= b.length, "truncated PPM pixel data")
    var s = 0L
    while (i < end) { s += (b(i) & 0xff); i += 1 }
    (w, h, maxv, s)
  }

  /** Real BMP parse (BITMAPINFOHEADER, 24bpp uncompressed): little-endian
    * header fields → dimensions and pixel-array offset, then an exact sum
    * over the pixel bytes, skipping each row's 4-byte-alignment padding. */
  def decodeBmp(b: Array[Byte]): (Int, Int, Long) = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
    def le32(o: Int): Int = (b(o) & 0xff) | (b(o + 1) & 0xff) << 8 |
      (b(o + 2) & 0xff) << 16 | (b(o + 3) & 0xff) << 24
    val dataOff = le32(10)
    val w = le32(18); val h = le32(22)
    val bpp = (b(28) & 0xff) | (b(29) & 0xff) << 8
    require(bpp == 24 && le32(30) == 0, "only 24bpp uncompressed BMP")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    require(dataOff + rowBytes * h <= b.length, "truncated BMP pixel data")
    var s = 0L
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w * 3) { s += (b(dataOff + r * rowBytes + c) & 0xff); c += 1 }
      r += 1
    }
    (w, h, s)
  }

  /** REAL decode kernel for uncompressed formats, dispatched on magic
    * bytes, in the same per-partition batch shape as [[decodeStub]].
    * Unknown/compressed formats throw — a production pipeline routes
    * those to its codec binding (here: [[decodeStub]]). */
  def decodeImage(assets: Dataset[(Long, Array[Byte])]): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { case (id, bytes) =>
        if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') {
          val (w, h, _, s) = decodePpm(bytes)
          DecodedImage(id, "ppm", w, h, w.toLong * h * 3, s)
        } else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
          val (w, h, s) = decodeBmp(bytes)
          DecodedImage(id, "bmp", w, h, w.toLong * h * 3, s)
        } else {
          throw new IllegalArgumentException(
            s"asset $id: unsupported format (route to a codec binding)")
        }
      }
    }
  }

  /** STUB decode kernel — swap for a real codec binding in production.
    * Deterministic: "features" are simple byte statistics, "dimensions"
    * derive from the length. Runs per-partition so a real decoder could
    * amortize codec init across the batch exactly like a Pandas UDF. */
  def decodeStub(assets: Dataset[(Long, Array[Byte])]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition "codec init" would happen here
      it.map { case (id, bytes) =>
        val n = bytes.length
        var sum = 0L
        var i = 0
        while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
        DecodedAsset(
          doc_id = id,
          mime = "application/octet-stream",
          n_bytes = n.toLong,
          width = (n % 640) + 1,
          height = (n % 480) + 1,
          features = Array((n.toFloat), (sum.toFloat / math.max(n, 1))))
      }
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Asset metadata over a binary payload column: sizes, checksums, fake
    // dimensions. The scan → binary-encode → hash → project pipeline is
    // exactly the shape of real media ETL (payload never shuffles).
    QueryDef(
      "q_multimodal_meta",
      s"""SELECT doc_id,
        |  'application/octet-stream' AS mime,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS checksum,
        |  (octet_length(encode(text)) % 640) + 1 AS width,
        |  (octet_length(encode(text)) % 480) + 1 AS height,
        |  ${Num.sql("octet_length(encode(text)) / 1024.0", 6)} AS kib
        |FROM documents""".stripMargin) { (s, dir) =>
      val payload = col("text").cast("binary")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        lit("application/octet-stream").as("mime"),
        length(payload).cast("long").as("n_bytes"),
        md5(payload).as("checksum"),
        ((length(payload) % 640) + 1).as("width"),
        ((length(payload) % 480) + 1).as("height"),
        Num.r(length(payload).cast("double") / 1024.0, 6).as("kib"))
    },

    // ------------------------------------------------------------------
    // "Resize" stub: a bounded byte-range of the payload stands in for a
    // thumbnail (real codecs would decode-and-scale; the byte-slice keeps
    // the plumbing — bounded output size per asset, checksummed — real).
    // The corpus is ASCII so the char slice is the byte slice on both
    // engines.
    QueryDef(
      "q_multimodal_resize",
      """SELECT doc_id,
        |  least(octet_length(encode(text)), 64) AS thumb_bytes,
        |  md5(substr(text, 1, 64)) AS thumb_checksum
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        least(length(col("text").cast("binary")), lit(64)).as("thumb_bytes"),
        md5(substring(col("text"), 1, 64).cast("binary")).as("thumb_checksum"))
    },

    // ------------------------------------------------------------------
    // REAL decode end-to-end: each document becomes an actual P6 PPM
    // (header + comment + raw RGB, pixel k = (doc_id + k) % 256), and
    // [[decodeImage]] parses the BYTES — header walk for dimensions, a
    // fold over the pixel array for the checksum. The oracle recomputes
    // width/height/checksum arithmetically from doc_id, so a decoder that
    // misreads the header, miscounts the comment line, or starts the
    // pixel array one byte off hash-mismatches immediately. Encode and
    // decode both run per-partition on the executors; only the small
    // decoded rows leave them — the 100 TB shape for media ETL.
    QueryDef(
      "q_multimodal_decode",
      """SELECT doc_id, 'ppm' AS fmt,
        |  CAST((doc_id % 8) + 1 AS INTEGER) AS width,
        |  CAST((doc_id % 6) + 1 AS INTEGER) AS height,
        |  CAST(((doc_id % 8) + 1) * ((doc_id % 6) + 1) * 3 AS BIGINT)
        |    AS n_pix_bytes,
        |  CAST(list_sum(list_transform(
        |    range(0, ((doc_id % 8) + 1) * ((doc_id % 6) + 1) * 3),
        |    k -> (doc_id + k) % 256)) AS BIGINT) AS pix_sum
        |FROM documents""".stripMargin) { (s, dir) =>
      import s.implicits._
      val assets = Tables(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .map { id =>
          val w = (id % 8).toInt + 1
          val h = (id % 6).toInt + 1
          (id, encodePpm(w, h, k => ((id + k) % 256).toInt))
        }
      decodeImage(assets).toDF()
    },

    // ------------------------------------------------------------------
    // Frame sampling: one row per sampled frame at 0.5 fps over a fake
    // duration derived from the payload size — explode(sequence) bounds
    // output rows per asset, the pattern for video → frame tables.
    QueryDef(
      "q_multimodal_frames",
      """WITH a AS (
        |  SELECT doc_id, octet_length(encode(text)) // 100 AS duration_s
        |  FROM documents)
        |SELECT doc_id, unnest(range(0, (duration_s // 2) + 1)) AS frame_idx,
        |  unnest(range(0, (duration_s // 2) + 1)) * 2 AS frame_ts_s
        |FROM a""".stripMargin) { (s, dir) =>
      val nBytes = length(col("text").cast("binary"))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          nBytes.cast("long").divide(100).cast("long").as("duration_s"))
        .select(col("doc_id"),
          explode(sequence(lit(0L),
            col("duration_s").divide(2).cast("long"))).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          (col("frame_idx") * 2).as("frame_ts_s"))
    }
  )
}
