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

/** Multimodal column plumbing (SURVEY.md §2B north star): media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * STUB — [[decodeStub]] produces a deterministic fake (byte stats as
  * "features"). Everything around it is real and is what matters at
  * 100 TB: the binary column representation, the typed metadata struct,
  * the per-partition batch shape (`mapPartitions` over an iterator, the
  * Scala analogue of a Pandas-UDF batch), and the explode-based frame
  * sampling that turns one asset row into N bounded frame rows without
  * shuffling the payload.
  *
  * The payload here is synthesized from `documents.text` (utf8 bytes) so
  * the pipeline runs on the standard testdata and stays oracle-checkable.
  */
object Multimodal {

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
