package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): image/audio/video as
  * opaque `binary` payloads with typed metadata, and the
  * decode/feature/sample stages a training pipeline runs over them.
  *
  * The container has no image/audio codecs, so [[decodeImageStub]] is
  * a clearly-marked deterministic STUB — it fabricates plausible
  * (width, height, channel-mean) metadata from the payload bytes. The
  * Spark-side shape is the real deliverable: binary columns flow
  * through parquet scans/shuffles untouched, per-row decode is a
  * typed `mapPartitions` (one codec init per partition, the pattern a
  * real JNI/FFI decoder needs), and frame sampling is pure column
  * algebra over binary slices.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte])
  case class DecodedImage(media_id: Long, width: Int, height: Int,
      n_bytes: Int, mean_byte: Double)

  /** Wrap a text corpus as fake media payloads (modality round-robin)
    * — the testdata has no real image bytes; schema/partitioning are
    * what matters. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decode: deterministic fake image metadata from payload
    * bytes. A real deployment swaps the body for a codec call; the
    * mapPartitions shape (partition-level init, streamed rows) and the
    * output schema stay identical. */
  def decodeImageStub(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // partition-level "codec init" would go here
        rows.map { case (id, payload) =>
          val n = payload.length
          var sum = 0L
          var i = 0
          while (i < n) { sum += payload(i) & 0xff; i += 1 }
          DecodedImage(
            media_id = id,
            width = 64 + (if (n == 0) 0 else (payload(0) & 0xff) % 192),
            height = 64 + (if (n < 2) 0 else (payload(1) & 0xff) % 192),
            n_bytes = n,
            mean_byte = if (n == 0) 0.0 else sum.toDouble / n)
        }
      }
  }

  /** Resize STUB: normalize every payload to exactly `targetBytes` —
    * truncate long payloads, zero-pad short ones. The real pipeline
    * swaps this for an image resize; what stays identical is the
    * contract a training loader needs (fixed-size binary column,
    * row-local, codegen'd — `substring`/`concat` on binary, no UDF). */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame = {
    val pad = lit(Array.fill[Byte](targetBytes)(0))
    media.withColumn("resized",
        substring(concat(col("payload"), pad), 1, targetBytes))
      .withColumn("resized_bytes", octet_length(col("resized")))
  }

  /** Frame sampling: slice the payload into fixed-size "frames" and
    * keep every `stride`-th — pure column algebra (substring on
    * binary), no UDF, so it stays in codegen and pushes through
    * shuffles as bytes. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int")
    media.select(col("media_id"), col("modality"),
        posexplode(transform(
          sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => substring(col("payload"), (i * frameBytes) + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")
      .filter(pmod(col("frame_no"), lit(stride)) === 0)
      .withColumn("frame_bytes", octet_length(col("frame")))
      .drop("frame")
  }
}
