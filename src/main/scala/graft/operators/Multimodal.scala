package graft.operators

import graft.{Q, QueryModule}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Typed output row of the stub media decoder (q35). */
case class MediaMeta(
    doc_id: Long, n_bytes: Int, width: Int, height: Int,
    format: String, frame_hash: String)

/** Multimodal-column plumbing — beyond-reference extension (SURVEY.md §7
  * M5). Media payloads are opaque `binary` columns with typed metadata
  * alongside; the decode step is a clearly-marked deterministic STUB (no
  * image/audio libs in this container) but the Spark-side plumbing —
  * schema, batch shape, partition-parallel decode via mapPartitions over a
  * typed Dataset — is real. Swapping the stub for a JNI/ImageIO decoder
  * changes one function body, not the plan.
  */
object Multimodal extends QueryModule {

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
    * Dataset of (id, payload). The stub derives deterministic fake
    * width/height/format/frame-hash from the payload; a real decoder drops
    * into the same iterator. No driver-side collect anywhere.
    *
    * The fake formulas are deliberately arithmetic the DuckDB oracle can
    * reproduce (octet_length + md5 of a 16-char header prefix), so this
    * query gets a full hash-match check instead of a rows-only one even
    * though the decode itself is stubbed.
    */
  val decodeStub: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)].mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          // STUB decoder — replace with a real image/audio decode; the
          // container ships no media libs. Everything below is derived
          // deterministically from the payload.
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val w = 64 + (bytes.length % 512)
          val h = 64 + ((bytes.length / 2) % 512)
          md.reset()
          val hex = md.digest(text.take(16)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          val fmt = if ("02468ace".contains(hex.charAt(0))) "jpeg-stub" else "png-stub"
          MediaMeta(id, bytes.length, w, h, fmt, hex.substring(0, 16))
        }
      }.toDF().orderBy("doc_id")
  }

  def queries: Map[String, Q] = Map(
    "q34_multimodal_meta" -> mediaMeta,
    "q35_multimodal_decode" -> decodeStub)

  def oracles: Map[String, String] = Map(
    "q35_multimodal_decode" ->
      """SELECT doc_id,
        | CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
        | CAST(64 + octet_length(text::BLOB) % 512 AS INT) AS width,
        | CAST(64 + (octet_length(text::BLOB) // 2) % 512 AS INT) AS height,
        | CASE WHEN strpos('02468ace', substring(md5(substring(text, 1, 16)), 1, 1)) > 0
        |   THEN 'jpeg-stub' ELSE 'png-stub' END AS format,
        | substring(md5(substring(text, 1, 16)), 1, 16) AS frame_hash
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
        | md5(text) AS payload_md5,
        | to_base64(substring(text, 1, 8)::BLOB) AS header_b64
        |FROM documents ORDER BY doc_id""".stripMargin)
}
