package graft.operators

import graft.{Q, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Typed output row of the stub media decoder (q35). */
case class MediaMeta(
    doc_id: Long, n_bytes: Int, width: Int, height: Int,
    format: String, frame_hash: Long)

/** Multimodal-column plumbing — beyond-reference extension (SURVEY.md §7
  * M5). Media payloads are opaque `binary` columns with typed metadata
  * alongside; the decode step is a clearly-marked deterministic STUB (no
  * image/audio libs in this container) but the Spark-side plumbing —
  * schema, batch shape, partition-parallel decode via mapPartitions over a
  * typed Dataset — is real. Swapping the stub for a JNI/ImageIO decoder
  * changes one function body, not the plan.
  */
object Multimodal extends QueryModule {

  /** doc_id + fake binary payload (the document text's bytes stand in for
    * an encoded image; at 100 TB this column is the blob read straight
    * from parquet).
    */
  private def payloads(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** q34 — metadata extraction over binary payloads: byte length, content
    * hash, header slice. All codegen'd built-ins; oracle-checked.
    */
  val mediaMeta: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      length(col("text").cast("binary")).as("n_bytes"),
      md5(col("text").cast("binary")).as("payload_md5"),
      base64(substring(col("text"), 1, 8).cast("binary")).as("header_b64"))
      .orderBy("doc_id")

  /** q35 — partition-parallel decode (STUB): mapPartitions over a typed
    * Dataset of (id, bytes). The stub derives deterministic fake
    * width/height/format/frame-hash from the bytes; a real decoder drops
    * into the same iterator. No driver-side collect anywhere.
    */
  val decodeStub: Q = (s, d) => {
    import s.implicits._
    payloads(s, d).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        // STUB decoder — replace with a real image/audio decode; the
        // container ships no media libs. Everything below is derived
        // deterministically from the payload bytes.
        val w = 64 + (bytes.length % 512)
        val h = 64 + ((bytes.length / 2) % 512)
        val fmt = if (bytes.nonEmpty && bytes(0) % 2 == 0) "jpeg-stub" else "png-stub"
        val frameHash = bytes.take(16).foldLeft(0L)((a, b) => a * 31 + (b & 0xffL))
        MediaMeta(id, bytes.length, w, h, fmt, frameHash)
      }
    }.toDF().orderBy("doc_id")
  }

  def queries: Map[String, Q] = Map(
    "q34_multimodal_meta" -> mediaMeta,
    "q35_multimodal_decode" -> decodeStub)

  def oracles: Map[String, String] = Map(
    // q35 is a stub decode — rows-only check by design.
    "q34_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
        | md5(text) AS payload_md5,
        | to_base64(substring(text, 1, 8)::BLOB) AS header_b64
        |FROM documents ORDER BY doc_id""".stripMargin)
}
