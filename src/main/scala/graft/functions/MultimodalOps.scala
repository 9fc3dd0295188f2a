package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, QueryModule, Tables}

/** Multimodal-column block (north-star): media as opaque `binary` payloads
  * with typed metadata, processed through the real distributed plumbing —
  * a typed Dataset `mapPartitions` pass (the Scala analogue of
  * mapInPandas-batched decode): per-partition iterator, no driver
  * collection, output schema declared by the case-class encoder.
  *
  * STUB NOTICE: no image/audio codecs exist in this container, so
  * `decodeStub` is a clearly-marked deterministic fake decoder over the
  * payload bytes (documents.text encoded UTF-8 stands in for the media
  * blob). The Spark-side plumbing — binary column, typed encoder, batch
  * iteration, partitioning — is real and oracled; swapping in a real codec
  * replaces ONLY the body of decodeStub.
  */
object MultimodalOps extends QueryModule {

  /** A decoded media record: deterministic pseudo-features of the payload. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,   // payload size ("file size")
      head_sum: Long,  // sum of first 16 byte values ("header checksum")
      tail_code: Int,  // last byte ("trailer marker")
      fake_w: Int,     // n_bytes % 64  ("decoded width")
      fake_h: Int)     // n_bytes % 48  ("decoded height")

  /** ===== DETERMINISTIC FAKE DECODER (stub for a real image/audio codec;
    * replace the body with e.g. javax.imageio / ffmpeg bindings) =====
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    val headSum = payload.iterator.take(16).map(b => (b & 0xff).toLong).sum
    val tail = if (payload.isEmpty) 0 else payload(payload.length - 1) & 0xff
    MediaFeatures(docId, n, headSum, tail, (n % 64).toInt, (n % 48).toInt)
  }

  /** The distributed decode pass: binary payload column → typed features.
    * mapPartitions (not map) so a real codec can amortize per-batch init
    * (decoder handles, model weights) across the partition's records.
    */
  def decodeAll(docs: DataFrame): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (once, not per record)
        it.map { case (id, payload) => decodeStub(id, payload) }
      }
  }

  /** Oracled query over the decode pass. The DuckDB twin recomputes the
    * fake features in SQL (payload bytes == ASCII codes for this corpus —
    * verified octet_length == length on all rows).
    */
  private val qMultimodalDecode = GQuery(
    (s, d) => decodeAll(Tables(s, d, "documents")).toDF().orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CAST(coalesce(list_sum(list_transform(
                     generate_series(1, least(length(text), 16)),
                     i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS BIGINT)
                     AS head_sum,
                   CAST(ascii(substr(text, length(text), 1)) AS INT) AS tail_code,
                   CAST(octet_length(encode(text)) % 64 AS INT) AS fake_w,
                   CAST(octet_length(encode(text)) % 48 AS INT) AS fake_h
            FROM documents ORDER BY doc_id"""))

  override val queries: Map[String, GQuery] = Map(
    "q_multimodal_decode" -> qMultimodalDecode)
}
