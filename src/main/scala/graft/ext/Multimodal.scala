package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * The real decode step (image/audio codecs) is STUBBED — the container
  * has no media libraries — but every piece of Spark-side plumbing is
  * real and tested: binary column construction, metadata struct schema,
  * deterministic "decode" output shape, frame sampling, and batch-wise
  * partitioning. Swapping the stub for a real codec is a one-function
  * change in [[decodeStub]].
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
