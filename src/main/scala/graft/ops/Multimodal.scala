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
  case class MediaPhash(doc_id: Long, w1: Long, w2: Long)

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

  /** Perceptual-hash near-dup over the binary media column — the image
    * dedup stage of a multimodal pipeline (pHash/aHash family): each
    * payload hashes to a 64-bit code (64 byte-windows → one parity bit
    * each via the same bounded modular rolling hash as the features
    * stub — a real pHash would DCT the decoded pixels; the code SHAPE
    * and everything downstream is the production pipeline), packed as
    * two 32-bit words (the q_ann_bq signed-BIGINT lesson). Candidate
    * pairs come from 4×16-bit band buckets (the minhash banding shape:
    * any shared quarter of the code makes a candidate — Hamming ≤ 8
    * guarantees ≥ one clean band by pigeonhole), then exact
    * `bit_count(xor)` verification keeps pairs at distance ≤ 8. The
    * fixture has no binary near-dups, so each payload also emits a
    * last-byte-flipped re-encode variant (doc_id + 10⁹) — "the same
    * image re-encoded with one corrupted byte": only the final window's
    * parity can change, so every planted pair verifies at distance ≤ 1
    * while random pairs sit near 32 and never pass. Scale shape:
    * banding bounds the candidate join exactly like text minhash; the
    * verify is register arithmetic on 16 bytes/pair. Fully oracled
    * (DuckDB replays the byte windows from hex, the parity packing,
    * the band join, and the xor popcount).
    */
  private def mediaPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = mediaRows(s, dir)
    val variants = rows.map { r =>
      val c = r.media.clone()
      if (c.nonEmpty) c(c.length - 1) = (c(c.length - 1) ^ 1).toByte
      MediaRow(r.doc_id + 1000000000L, c)
    }
    val codes = rows.union(variants).mapPartitions { it =>
      it.map { r =>
        val n = r.media.length
        val bits = Array.tabulate(64) { i =>
          val start = if (n == 0) 0 else (i.toLong * n / 64).toInt
          val end = if (n == 0) 0 else ((i + 1).toLong * n / 64).toInt
          var acc = 0L
          var j = start
          while (j < end) { acc = (acc * 31 + (r.media(j) & 0xff)) % 1000003L; j += 1 }
          acc % 2L
        }
        def word(lo: Int): Long =
          (lo until lo + 32).foldLeft(0L)((a, k) => a * 2 + bits(k))
        MediaPhash(r.doc_id, word(0), word(32))
      }
    }.toDF()
    val bandRows = codes.select(col("doc_id"), col("w1"), col("w2"),
      posexplode(array(
        shiftright(col("w1"), 16).bitwiseAND(65535L),
        col("w1").bitwiseAND(65535L),
        shiftright(col("w2"), 16).bitwiseAND(65535L),
        col("w2").bitwiseAND(65535L))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "v")
    val cands = bandRows.as("a").join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ai"), col("b.doc_id").as("bi"),
        col("a.w1").as("aw1"), col("a.w2").as("aw2"),
        col("b.w1").as("bw1"), col("b.w2").as("bw2"))
      .distinct()
    cands
      .withColumn("ham",
        (expr("bit_count(aw1 ^ bw1)") + expr("bit_count(aw2 ^ bw2)")).cast("int"))
      .filter(col("ham") <= 8)
      .select("ai", "bi", "ham")
      .orderBy("ai", "bi")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_media_features" -> (mediaFeatures _),
    "q_media_resize" -> (mediaResize _),
    "q_frame_sample" -> (frameSample _),
    "q_media_phash" -> (mediaPhash _)
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
        "FROM f GROUP BY doc_id ORDER BY doc_id"),
    "q_media_phash" ->
      ("WITH m AS MATERIALIZED (SELECT doc_id, hex(encode(text)) AS mhex, CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents), " +
        // decode the hex into a byte list once, then emit the original
        // and the last-byte-flipped re-encode variant
        "bylist AS MATERIALIZED (SELECT doc_id, n, list_transform(range(CAST(0 AS BIGINT), n), " +
        "j -> CAST((strpos('0123456789ABCDEF', substr(mhex, CAST(j*2+1 AS BIGINT), 1))-1)*16 " +
        "+ strpos('0123456789ABCDEF', substr(mhex, CAST(j*2+2 AS BIGINT), 1))-1 AS BIGINT)) AS bs FROM m), " +
        "allm AS MATERIALIZED (SELECT doc_id, n, bs FROM bylist " +
        "UNION ALL SELECT doc_id + 1000000000, n, " +
        "CASE WHEN n = 0 THEN bs ELSE list_append(bs[1:CAST(n-1 AS BIGINT)], xor(bs[CAST(n AS BIGINT)], 1)) END FROM bylist), " +
        // 64 window parities -> two 32-bit words (MSB-first fold)
        "w AS (SELECT doc_id, i, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "bs[CAST((i*n)//64 + 1 AS BIGINT):CAST(((i+1)*n)//64 AS BIGINT)]), " +
        "(a, b) -> (a * 31 + b) % 1000003) % 2 AS bit " +
        "FROM allm CROSS JOIN range(0, 64) t(i)), " +
        "c AS MATERIALIZED (SELECT doc_id, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), (list(bit ORDER BY i))[1:32]), (a, b) -> a * 2 + b) AS w1, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), (list(bit ORDER BY i))[33:64]), (a, b) -> a * 2 + b) AS w2 " +
        "FROM w GROUP BY doc_id), " +
        "bands AS (SELECT doc_id, w1, w2, unnest([(w1 >> 16) & 65535, w1 & 65535, (w2 >> 16) & 65535, w2 & 65535]) AS v, " +
        "unnest([0, 1, 2, 3]) AS band FROM c), " +
        "p AS (SELECT DISTINCT a.doc_id AS ai, b.doc_id AS bi, a.w1 AS aw1, a.w2 AS aw2, b.w1 AS bw1, b.w2 AS bw2 " +
        "FROM bands a JOIN bands b ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id) " +
        "SELECT ai, bi, CAST(bit_count(xor(aw1, bw1)) + bit_count(xor(aw2, bw2)) AS INT) AS ham " +
        "FROM p WHERE bit_count(xor(aw1, bw1)) + bit_count(xor(aw2, bw2)) <= 8 ORDER BY ai, bi")
  )
}
