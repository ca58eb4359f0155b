package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract runs as
  * per-partition imperative code over the binary bytes. The container
  * has no image/audio codecs, so the "decode" is a deterministic stub
  * (fixed-size frame slicing + md5 fingerprints) — but the Spark-side
  * shape is the real thing: binary column in, `mapPartitions` with one
  * reusable codec handle per partition, typed frame rows out.
  *
  * The stub arithmetic is md5-based on byte slices, so the DuckDB
  * oracle reproduces it exactly (docs are ASCII ⇒ char slices == byte
  * slices).
  */
object Multimodal {

  private val FrameBytes = 64
  private val MaxFrames = 8

  val all: Seq[Q] = Seq(
    // binary ingestion + metadata: payload bytes, sizes, head fingerprint
    Q(
      "q61_binary_meta",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("payload", encode(col("text"), "UTF-8"))
          .select(
            col("doc_id"),
            length(col("payload")).as("n_bytes"),
            col("n_chars"),
            lower(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("head_hex"),
            md5(col("payload")).as("payload_md5")
          )
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               n_chars,
               lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
               md5(text) AS payload_md5
        FROM documents ORDER BY doc_id""")
    ),

    // stubbed decode/frame-sample: per-partition imperative extraction
    // over the binary payload (the mapPartitions pattern a real codec
    // would use: one decoder instance per partition, streamed frames)
    Q(
      "q62_frame_extract",
      (s, d) => {
        val spark = s
        val src = Tables.documents(s, d)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val outSchema = new StructType()
          .add("doc_id", LongType)
          .add("frame_id", IntegerType)
          .add("frame_off", IntegerType)
          .add("frame_len", IntegerType)
          .add("frame_fp", LongType)
        val encoder = org.apache.spark.sql.Encoders.row(outSchema)
        src
          .mapPartitions { rows =>
            // one "codec" (digest) per partition, reused across rows —
            // where a real decoder handle would live
            val md = java.security.MessageDigest.getInstance("MD5")
            rows.flatMap { r =>
              val docId = r.getLong(0)
              val payload = r.getAs[Array[Byte]](1)
              val nFrames = math.min(MaxFrames, (payload.length + FrameBytes - 1) / FrameBytes)
              (0 until nFrames).iterator.map { i =>
                val off = i * FrameBytes
                val len = math.min(FrameBytes, payload.length - off)
                md.reset()
                val hexStr = md.digest(java.util.Arrays.copyOfRange(payload, off, off + len))
                  .map("%02x".format(_)).mkString
                val fp = java.lang.Long.parseLong(hexStr.substring(0, 15), 16)
                Row(docId, i, off, len, fp)
              }
            }
          }(encoder)
          .orderBy(col("doc_id"), col("frame_id"))
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
                 unnest(generate_series(0,
                   least($MaxFrames, CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS INT)) - 1)) AS frame_id
          FROM documents)
        SELECT doc_id,
               CAST(frame_id AS INT) AS frame_id,
               CAST(frame_id * $FrameBytes AS INT) AS frame_off,
               CAST(least($FrameBytes, n_bytes - frame_id * $FrameBytes) AS INT) AS frame_len,
               CAST('0x' || substr(md5(substr(text, frame_id * $FrameBytes + 1, $FrameBytes)), 1, 15) AS BIGINT) AS frame_fp
        FROM f ORDER BY doc_id, frame_id""")
    ),

    // stubbed audio feature extraction: fixed-rate sample windows over
    // the binary payload (bytes standing in for PCM samples), per-window
    // energy/peak computed imperatively per partition — the
    // feature-extract half of the multimodal story (q62 is the
    // frame-sample half). A real pipeline swaps the byte loop for a
    // codec call; schema, batching, and partitioning stay identical.
    Q(
      "q80_audio_windows",
      (s, d) => {
        val src = Tables.documents(s, d)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val outSchema = new StructType()
          .add("doc_id", LongType)
          .add("window_id", IntegerType)
          .add("n_samples", IntegerType)
          .add("energy", LongType)
          .add("peak", IntegerType)
        val encoder = org.apache.spark.sql.Encoders.row(outSchema)
        src
          .mapPartitions { rows =>
            rows.flatMap { r =>
              val docId = r.getLong(0)
              val payload = r.getAs[Array[Byte]](1)
              val nWin = math.min(MaxFrames, (payload.length + FrameBytes - 1) / FrameBytes)
              (0 until nWin).iterator.map { w =>
                val off = w * FrameBytes
                val len = math.min(FrameBytes, payload.length - off)
                var i = 0; var energy = 0L; var peak = 0
                while (i < len) {
                  val v = payload(off + i) & 0xff
                  energy += v
                  if (v > peak) peak = v
                  i += 1
                }
                Row(docId, w, len, energy, peak)
              }
            }
          }(encoder)
          .orderBy(col("doc_id"), col("window_id"))
      },
      Some(s"""
        WITH f AS (
          SELECT doc_id, text, octet_length(encode(text)) AS n_bytes,
                 unnest(generate_series(0,
                   least($MaxFrames, CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS INT)) - 1)) AS window_id
          FROM documents),
        seg AS (
          SELECT doc_id, window_id,
                 substr(text, window_id * $FrameBytes + 1, $FrameBytes) AS sg
          FROM f)
        SELECT doc_id,
               CAST(window_id AS INT) AS window_id,
               CAST(len(sg) AS INT) AS n_samples,
               CAST(list_sum(list_transform(generate_series(1, len(sg)),
                      i -> ascii(substr(sg, i, 1)))) AS BIGINT) AS energy,
               CAST(list_max(list_transform(generate_series(1, len(sg)),
                      i -> ascii(substr(sg, i, 1)))) AS INT) AS peak
        FROM seg ORDER BY doc_id, window_id""")
    ),

    // stubbed resize/resample: deterministic 4:1 stride downsample of
    // the payload (every 4th byte), the media-resize slot of the
    // multimodal pipeline — a real image resize swaps the stride for a
    // codec scale call; the column shape (binary in, smaller binary +
    // fingerprint out, pure projection, no shuffle) is what matters.
    Q(
      "q83_resample",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            col("n_chars"),
            array_join(
              transform(
                sequence(lit(1), col("n_chars").cast(IntegerType), lit(4)),
                i => col("text").substr(i, lit(1))),
              "").as("small"))
          .select(
            col("doc_id"),
            col("n_chars"),
            length(col("small")).as("resized_chars"),
            md5(col("small")).as("resized_md5"))
          .orderBy(col("doc_id")),
      Some("""
        WITH r AS (
          SELECT doc_id, n_chars,
                 array_to_string(list_transform(
                   generate_series(1, CAST(n_chars AS INT), 4),
                   i -> substr(text, i, 1)), '') AS small
          FROM documents)
        SELECT doc_id, n_chars,
               CAST(len(small) AS INT) AS resized_chars,
               md5(small) AS resized_md5
        FROM r ORDER BY doc_id""")
    )
  )
}
