package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing — north-star extension.
  *
  * Media payloads are opaque `binary` columns travelling next to typed
  * metadata; decode/feature-extract runs per partition so one task holds
  * one batch of payloads at a time (the Scala analog of `mapInPandas`).
  * The decoders themselves are STUBS (no image/audio libs in this
  * container) — deterministic functions of the bytes with the real
  * schema/partitioning/batching shape around them.
  */
object Multimodal {

  /** Decoded-feature schema a real decoder would produce. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("format", StringType),      // sniffed from leading bytes
    StructField("width", IntegerType),      // stub: derived deterministically
    StructField("height", IntegerType),
    StructField("feature", ArrayType(DoubleType)))) // stub embedding

  /** STUB decoder: a real implementation would parse the container format
    * (JPEG/PNG/WAV...) here; this derives deterministic pseudo-metadata
    * from the bytes so the pipeline is testable end-to-end. */
  private def decodeStub(docId: Long, payload: Array[Byte]): Row = {
    val n = payload.length
    val fmt = if (n % 3 == 0) "img/png" else if (n % 3 == 1) "img/jpeg" else "audio/wav"
    val w = 64 + (payload.headOption.getOrElse(0: Byte) & 0x3f)
    val h = 64 + (payload.lastOption.getOrElse(0: Byte) & 0x3f)
    val feat = (0 until 8).map { i =>
      if (n == 0) 0.0 else payload(i * payload.length / 8) / 128.0
    }
    Row(docId, n, fmt, w, h, feat)
  }

  /** documents.text re-exposed as a binary payload column + metadata —
    * the shape a real media table would have. */
  def payloadTable(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))

  /** Per-partition decode: one partition of payloads per task, rows
    * emitted lazily (no full-partition materialization). */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    payloadTable(s, d).select(col("doc_id"), col("payload"))
      .mapPartitions(_.map { r =>
        decodeStub(r.getLong(0), r.getAs[Array[Byte]](1))
      })(enc)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- binary payload plumbing: roundtrip + content addressing
    QueryDef(
      "multimodal_payload",
      (s, d) =>
        payloadTable(s, d).select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          (length(decode(col("payload"), "UTF-8")) === octet_length(col("payload")))
            .as("ascii_roundtrip"),
          col("meta.lang").as("lang"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                octet_length(encode(text)) AS n_bytes,
                md5(text) AS payload_md5,
                length(text) = octet_length(encode(text)) AS ascii_roundtrip,
                lang
              FROM documents ORDER BY doc_id""")),

    // ---- stubbed decode via mapPartitions: schema + batching are real,
    //      the decoder body is the documented stub. Oracle checks the
    //      deterministic parts (byte counts per sniffed format).
    QueryDef(
      "multimodal_decode",
      (s, d) =>
        decodeFeatures(s, d)
          .groupBy(col("format"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("total_bytes"))
          .orderBy(col("format")),
      Some("""SELECT CASE WHEN octet_length(encode(text)) % 3 = 0 THEN 'img/png'
                          WHEN octet_length(encode(text)) % 3 = 1 THEN 'img/jpeg'
                          ELSE 'audio/wav' END AS format,
                COUNT(*) AS n_docs,
                CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
              FROM documents GROUP BY 1 ORDER BY format""")),

    // ---- resize/downsample: REAL byte-level logic — every 8-byte block
    //      of the payload averages (integer floor) into one output byte,
    //      the batch shape an image resize / audio downsample has: a
    //      per-partition transform producing a smaller binary per row,
    //      lazily emitted. A real resizer swaps the block-average for
    //      the codec's kernel; schema, partitioning, and per-doc output
    //      sizing are the production shape. Oracle re-derives the
    //      downsampled byte sums with nested list comprehensions.
    QueryDef(
      "multimodal_resize",
      (s, d) => {
        val block = 8
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_bytes", IntegerType),
          StructField("n_resized", IntegerType),
          StructField("resized_sum", LongType)))
        val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
        payloadTable(s, d).select(col("doc_id"), col("payload"))
          .mapPartitions(_.map { r =>
            val payload = r.getAs[Array[Byte]](1)
            val resized = payload.grouped(block).map { b =>
              (b.map(_ & 0xff).sum / b.length).toByte
            }.toArray
            Row(r.getLong(0), payload.length, resized.length,
              resized.map(_ & 0xff).sum.toLong)
          })(enc)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                CAST(ceil(octet_length(encode(text)) / 8.0) AS INT) AS n_resized,
                CAST(list_sum(list_transform(
                  range(0, CAST(ceil(octet_length(encode(text)) / 8.0) AS INT)),
                  b -> list_sum(list_transform(
                         range(b * 8, least((b + 1) * 8,
                               octet_length(encode(text)))),
                         j -> ord(substr(text, CAST(j + 1 AS INT), 1))))
                       // (least((b + 1) * 8, octet_length(encode(text)))
                          - b * 8)))
                  AS BIGINT) AS resized_sum
              FROM documents ORDER BY doc_id""")),

    // ---- frame sampling: REAL byte-level logic (no media libs needed) —
    //      the payload is framed at 32 bytes and every 4th frame sampled,
    //      the batch shape a video/audio frame sampler has: per-partition
    //      iteration, per-doc frame slicing, lazily emitted rows. The
    //      oracle re-derives frame counts and the sampled-frame byte
    //      checksum with list comprehensions over the same bytes.
    QueryDef(
      "multimodal_framesample",
      (s, d) => {
        val frameLen = 32
        val stride = 4
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_frames", IntegerType),
          StructField("n_sampled", IntegerType),
          StructField("sampled_byte_sum", LongType)))
        val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
        payloadTable(s, d).select(col("doc_id"), col("payload"))
          .mapPartitions(_.map { r =>
            val payload = r.getAs[Array[Byte]](1)
            val nFrames = (payload.length + frameLen - 1) / frameLen
            val sampledIdx = 0 until nFrames by stride
            val byteSum = sampledIdx.map(i =>
              (payload(i * frameLen) & 0xff).toLong).sum
            Row(r.getLong(0), nFrames, sampledIdx.length, byteSum)
          })(enc)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                CAST(ceil(octet_length(encode(text)) / 32.0) AS INT) AS n_frames,
                CAST(len(range(0, CAST(ceil(octet_length(encode(text)) / 32.0) AS INT), 4))
                  AS INT) AS n_sampled,
                CAST(list_sum(list_transform(
                  range(0, CAST(ceil(octet_length(encode(text)) / 32.0) AS INT), 4),
                  i -> ord(substr(text, CAST(i * 32 + 1 AS INT), 1))))
                  AS BIGINT) AS sampled_byte_sum
              FROM documents ORDER BY doc_id"""))
  )
}
