package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2 north-star: "multimodal
  * columns"): media as opaque `binary` columns with typed metadata
  * structs, processed partition-wise in batches.
  *
  * The decode step is STUBBED with a deterministic fake (this container
  * has no image/audio codecs — see `MediaFeatures.fakeDecode`); the
  * Spark-side plumbing is real: binary column, metadata schema,
  * per-partition batched processing (the Scala analog of
  * `mapInPandas`), and the partitioning/batch shape a real
  * decoder would see at 100 TB.
  */
object Multimodal {

  /** Typed metadata + content hash over a binary media column. Here the
    * "media" is the UTF-8 encoding of `text` — the point is the schema
    * and the byte-level functions, which are mime-agnostic. Oracled:
    * byte length and md5 are byte-exact in both engines.
    */
  private def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("media", col("text").cast("binary"))
      .select(
        col("doc_id"),
        lit("text/plain").as("mime"),
        length(col("media")).as("n_bytes"),
        md5(col("media")).as("content_md5"))
      .orderBy("doc_id")

  /** Case class row for the typed media pipeline. */
  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, feat: Array[Float])

  /** Batched partition-wise "decode + featurize": one iterator per
    * partition, so a real decoder would amortize model/codec init across
    * the whole batch — exactly the mapInPandas contract. The decode
    * itself is a clearly-marked deterministic fake; because it's a
    * bounded modular rolling hash, the DuckDB oracle replays it from the
    * payload's hex string and the query is hash-checked end to end.
    */
  object MediaFeaturesStub {
    /** STUB for the real media decoder (PIL/librosa/ffmpeg would go here;
      * not present in this container). Deterministic: 8 pseudo-features
      * derived from byte-windows of the payload.
      */
    def fakeDecode(media: Array[Byte]): Array[Float] = {
      val n = media.length
      Array.tabulate(8) { i =>
        // long math: i * n overflows Int for payloads over ~268 MB
        val start = if (n == 0) 0 else (i.toLong * n / 8).toInt
        val end = if (n == 0) 0 else ((i + 1).toLong * n / 8).toInt
        var acc = 0L
        var j = start
        // modular rolling hash (prime 1000003): bounded, so the DuckDB
        // oracle can replay it in BIGINT arithmetic — Java's wrapping
        // overflow has no SQL twin
        while (j < end) { acc = (acc * 31 + (media(j) & 0xff)) % 1000003L; j += 1 }
        (acc % 1000).toFloat / 1000f
      }
    }
  }

  /** Typed media source shared by the batched decode ops: documents'
    * text bytes standing in for the opaque media payload.
    */
  private def mediaRows(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  private def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaRows(s, dir)
      .mapPartitions { rows =>
        // per-partition init happens once here (codec/model handle)
        rows.map(r => MediaFeatures(r.doc_id, r.media.length,
          MediaFeaturesStub.fakeDecode(r.media)))
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("feat"), 1).cast("double"), 4).as("feat0"),
        round(element_at(col("feat"), 8).cast("double"), 4).as("feat7"))
      .orderBy("doc_id")
  }

  /** "Resize" over a binary payload: fixed-output-size byte
    * downsampling — the media-resize shape (decode → scale → re-encode)
    * with the codec stubbed the same way as MediaFeaturesStub. The
    * thumbnail is produced as a real fixed-size `binary` value in the
    * typed pipeline; the registered query emits its size + content hash.
    * Oracled: the sampling is plain blob indexing, which DuckDB can
    * replay over hex(encode(text)); the hash is md5 over the thumb's HEX
    * string (hex-pair equality = byte equality) because this DuckDB has
    * no md5(BLOB). Pure projection, no shuffle.
    */
  private def mediaResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val targetBytes = 16
    mediaRows(s, dir)
      .mapPartitions { rows =>
        rows.map { r =>
          val n = r.media.length
          // STUB for a real scaler (PIL.Image.resize / ffmpeg scale):
          // sample one byte per output cell, deterministic; long math —
          // i * n overflows Int for payloads over ~134 MB
          val thumb = Array.tabulate(targetBytes) { i =>
            if (n == 0) 0.toByte else r.media((i.toLong * n / targetBytes).toInt)
          }
          (r.doc_id, n, thumb)
        }
      }
      .toDF("doc_id", "orig_bytes", "thumb")
      .select(col("doc_id"), col("orig_bytes"),
        length(col("thumb")).as("thumb_bytes"), md5(hex(col("thumb"))).as("thumb_md5"))
      .orderBy("doc_id")
  }

  /** "Frame sampling" over a binary payload: every k-th fixed-size byte
    * window becomes a frame row with its content hash — the explode shape
    * (media → n frame rows) a video pipeline produces. Oracled: the frame
    * hash is md5 over the window's HEX string (hex-pair equality = byte
    * equality, same convention as mediaResize), which DuckDB replays with
    * substr over hex(encode(text)). Pure projection + explode; scales
    * linearly.
    */
  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    val frameLen = 32
    val stride = 64
    Tables.documents(s, dir)
      .withColumn("media", col("text").cast("binary"))
      .filter(length(col("media")) >= frameLen)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), expr(s"(length(media) - $frameLen) div $stride")),
          i => md5(hex(col("media").substr(i * stride + 1, lit(frameLen)))))))
      .withColumnRenamed("pos", "frame_no").withColumnRenamed("col", "frame_hash")
      .orderBy("doc_id", "frame_no")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_media_features" -> (mediaFeatures _),
    "q_media_resize" -> (mediaResize _),
    "q_frame_sample" -> (frameSample _)
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      ("SELECT doc_id, 'text/plain' AS mime, CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes, " +
        "md5(text) AS content_md5 FROM documents ORDER BY doc_id"),
    "q_media_resize" ->
      ("WITH m AS (SELECT doc_id, hex(encode(text)) AS mhex, octet_length(encode(text)) AS n FROM documents) " +
        "SELECT doc_id, CAST(n AS INT) AS orig_bytes, CAST(16 AS INT) AS thumb_bytes, " +
        // empty payload: the Spark stub emits 16 zero bytes, so the hex
        // replay must too (substr over an empty hex string would yield '')
        "md5(CASE WHEN n = 0 THEN repeat('00', 16) ELSE " +
        "list_reduce(list_transform(range(0, 16), i -> substr(mhex, CAST((i*n)//16 AS BIGINT)*2 + 1, 2)), (a, b) -> a || b) END) AS thumb_md5 " +
        "FROM m ORDER BY doc_id"),
    "q_frame_sample" ->
      ("WITH m AS (SELECT doc_id, hex(encode(text)) AS mhex, octet_length(encode(text)) AS n " +
        "FROM documents WHERE octet_length(encode(text)) >= 32) " +
        "SELECT doc_id, CAST(i AS INT) AS frame_no, md5(substr(mhex, CAST(i*128 AS BIGINT) + 1, 64)) AS frame_hash " +
        "FROM m CROSS JOIN range(0, 100000) t(i) WHERE i <= (n - 32) // 64 " +
        "ORDER BY doc_id, frame_no"),
    "q_media_features" ->
      ("WITH m AS (SELECT doc_id, hex(encode(text)) AS mhex, octet_length(encode(text)) AS n FROM documents), " +
        "f AS (SELECT doc_id, n, i, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(CAST((i*n)//8 AS BIGINT), CAST(((i+1)*n)//8 AS BIGINT)), " +
        "j -> CAST((strpos('0123456789ABCDEF', substr(mhex, CAST(j*2+1 AS BIGINT), 1))-1)*16 " +
        "+ strpos('0123456789ABCDEF', substr(mhex, CAST(j*2+2 AS BIGINT), 1))-1 AS BIGINT))), " +
        "(a, b) -> (a * 31 + b) % 1000003) AS acc " +
        "FROM m CROSS JOIN (VALUES (0), (7)) t(i)) " +
        "SELECT doc_id, CAST(max(n) AS INT) AS n_bytes, " +
        "round(CAST(max(CASE WHEN i = 0 THEN acc % 1000 END) AS DOUBLE)/1000, 4) AS feat0, " +
        "round(CAST(max(CASE WHEN i = 7 THEN acc % 1000 END) AS DOUBLE)/1000, 4) AS feat7 " +
        "FROM f GROUP BY doc_id ORDER BY doc_id")
  )
}
