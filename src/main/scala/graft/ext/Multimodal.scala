package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * IMAGE decode is REAL: [[decodeImages]] runs the JDK-bundled
  * `javax.imageio` PNG/BMP codec per partition (no external library),
  * verified by the m03 oracle against analytically-known synthetic
  * images. Audio/video codecs are not in the JDK, so [[decodeStub]]
  * remains the stand-in for those payload kinds — with the same schema
  * and batching shape, so swapping in an ffmpeg-style binding is a
  * one-function change.
  *
  * At scale: payloads stay as parquet binary chunks co-partitioned with
  * their metadata; decode/feature-extract runs as a per-partition map
  * (no shuffle), and frame samples are narrow projections.
  */
object Multimodal {

  val FrameBytes = 32

  /** Attach a binary payload column (here: utf8 bytes of `text` stand in
    * for an image/audio blob) plus its typed metadata struct.
    */
  def withPayload(docs: DataFrame): DataFrame =
    graft.core.Tables.spread(docs)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .withColumn("media_meta", struct(
        length(col("payload")).as("n_bytes"),
        lit("fake/utf8").as("mime"),
        md5(col("payload")).as("checksum")))

  /** STUB decode: deterministic fake "image dimensions" derived from the
    * payload checksum. A real build replaces the width/height exprs with
    * a codec call (e.g. mapPartitions over javax.imageio) — the schema
    * and everything downstream stay identical.
    */
  def decodeStub(withBin: DataFrame): DataFrame =
    withBin
      .withColumn("decoded_width",
        (Hashing.h32(col("media_meta.checksum")) % 1920).cast("int"))
      .withColumn("decoded_height",
        (Hashing.h32(reverse(col("media_meta.checksum"))) % 1080).cast("int"))

  /** Frame sampling: hex dump of fixed-size byte windows (first frame
    * and the frame at the payload midpoint).
    */
  def sampleFrames(withBin: DataFrame): DataFrame =
    withBin
      .withColumn("frame0_hex",
        upper(hex(expr(s"substring(payload, 1, $FrameBytes)"))))
      .withColumn("mid_frame_hex",
        upper(hex(expr(
          s"substring(payload, (media_meta.n_bytes div 2) + 1, $FrameBytes)"))))
      .withColumn("n_frames",
        ceil(col("media_meta.n_bytes").cast("double") / FrameBytes).cast("long"))

  /** Batched per-partition decode plumbing — the shape a REAL codec
    * integration uses (javax.imageio / ffmpeg bindings process byte
    * payloads partition-by-partition, amortizing codec init across a
    * batch; the Scala analog of a pandas mapInPandas decoder). The
    * codec itself is injected so tests use a deterministic stub.
    */
  def decodeBatched(withBin: DataFrame)
                   (codec: Array[Byte] => (Int, Int)): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    val out = withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site for a real codec goes here
        it.map { case (id, bytes) =>
          val (w, h) = codec(bytes)
          (id, w, h)
        }
      }
      .toDF("doc_id", "width", "height")
    withBin.join(out, "doc_id")
  }

  /** Deterministic synthetic images, REALLY encoded as PNG: per doc, an
    * 8-bit grayscale image whose dimensions and pixel values are pure
    * functions of doc_id (w = 4 + id%13, h = 3 + id%7, pixel i in
    * row-major order = (id*31 + i) % 256). Because the content is
    * analytically known, the DuckDB oracle can verify the REAL codec
    * round-trip (encode here, decode in [[decodeImages]]) value-for-
    * value without itself decoding any image. Encoding runs per
    * partition like any real payload producer.
    */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Tables.spread(docs).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 4 + (id % 13).toInt
          val h = 3 + (id % 7).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((id * 31 + y * w + x) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** REAL image decode: `javax.imageio` (JDK-bundled — PNG, BMP, GIF,
    * JPEG) per partition, returning dimensions and the pixel sum of
    * band 0 — a content fingerprint the m03 oracle recomputes
    * analytically. Undecodable payloads yield null columns (the
    * malformed-input contract), never a task failure.
    */
  def decodeImages(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    val decoded = withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // ImageIO plugin discovery is amortized across the partition
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) (id, None: Option[Int], None: Option[Int],
              None: Option[Long])
            else {
              val raster = img.getRaster
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  sum += raster.getSample(x, y, 0)
                  x += 1
                }
                y += 1
              }
              (id, Some(img.getWidth), Some(img.getHeight), Some(sum))
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              (id, None: Option[Int], None: Option[Int], None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "width", "height", "pixel_sum")
    decoded
  }

  /** Full metadata/decode/sample projection used by the verify query. */
  def mediaPipeline(docs: DataFrame): DataFrame =
    sampleFrames(decodeStub(withPayload(docs)))
      .select(col("doc_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.mime").as("mime"),
        col("media_meta.checksum").as("checksum"),
        col("decoded_width"), col("decoded_height"),
        col("n_frames"), col("frame0_hex"), col("mid_frame_hex"))
      .orderBy(col("doc_id"))
}
