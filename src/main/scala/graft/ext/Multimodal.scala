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

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // spills through a temp file, and the codec-heavy operators touch it
  // tens of thousands of times per query (600 videos x 24 frames x
  // encode+decode) — on hosts with slow scratch disks that made m08/m09
  // 3x slower than the same code on fast disks. The payloads here are
  // in-memory byte arrays; the heap cache is strictly correct and
  // removes the filesystem from the hot path. Executors initialize this
  // when the object loads (every codec closure references it).
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Per-image smooth-ramp pixel rule for the JPEG family: a linear
    * gradient (no wraps, no sawtooth) so the lossy codec's error stays
    * small and a tight audit tolerance holds. Max value: 16·8 + 4·15 +
    * 4·8 = 220 < 256 at the largest synthetic geometry.
    */
  private[graft] def jpegPix(id: Long, x: Int, y: Int): Int =
    ((id % 17) * 8 + 4 * x + 4 * y).toInt

  /** JPEG-encode one grayscale image at a PINNED quality — the
    * quality-pinned synthesis the lossy-codec audit (m14) depends on:
    * `ImageWriteParam.MODE_EXPLICIT` fixes the quant tables, so the
    * encode is deterministic for a given JRE + input.
    */
  private def jpegBytes(img: java.awt.image.BufferedImage,
                        quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    try writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Synthetic grayscale images JPEG-encoded at a pinned quality —
    * the LOSSY twin of [[syntheticImages]] (same m03 geometry rule,
    * the smooth [[jpegPix]] content rule). A real 100 TB image corpus
    * is dominated by JPEG, so the decode path must be exercised
    * through a lossy codec, not only PNG's bit-exact round-trip.
    */
  def syntheticJpegImages(docs: DataFrame,
                          quality: Float = 0.85f): DataFrame = {
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
              raster.setSample(x, y, 0, jpegPix(id, x, y))
              x += 1
            }
            y += 1
          }
          (id, jpegBytes(img, quality))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Lossy-codec fidelity audit (the m03 discipline for JPEG):
    * synthesize [[syntheticJpegImages]], decode the REAL JPEG bytes
    * with `javax.imageio`, and compare every pixel against the
    * analytic [[jpegPix]] truth. Geometry must survive the codec
    * exactly (oracle-checked analytically); pixel content is lossy,
    * so the CONTRACT is the bounded-error booleans — max abs error ≤
    * `maxTol` and sum abs error ≤ `meanTol`·n_px — computed engine-
    * side in exact integers (the oracle asserts both hold on every
    * row; a codec regression flips them to false and fails the gate).
    * Undecodable payloads yield null columns, never a task failure.
    *
    * Scale shape: pure per-partition map over the binary column — no
    * shuffle, scan throughput, identical to [[decodeImages]].
    */
  def jpegDecodeAudit(docs: DataFrame, quality: Float = 0.85f,
                      maxTol: Int = 24, meanTol: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    syntheticJpegImages(docs, quality)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null)
              (id, None: Option[Int], None: Option[Int],
                None: Option[Long], None: Option[Boolean],
                None: Option[Boolean])
            else {
              val raster = img.getRaster
              val w = img.getWidth
              val h = img.getHeight
              var sumErr = 0L
              var maxErr = 0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val e = math.abs(raster.getSample(x, y, 0) -
                    jpegPix(id, x, y))
                  sumErr += e
                  if (e > maxErr) maxErr = e
                  x += 1
                }
                y += 1
              }
              (id, Some(w), Some(h), Some(w.toLong * h),
                Some(maxErr <= maxTol),
                Some(sumErr <= meanTol.toLong * w * h))
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              (id, None: Option[Int], None: Option[Int],
                None: Option[Long], None: Option[Boolean],
                None: Option[Boolean])
          }
        }
      }
      .toDF("doc_id", "width", "height", "n_px",
        "within_max_tol", "within_mean_tol")
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

  /** ViT-style patch-grid extraction over REAL decoded images: split
    * each image into non-overlapping `p`x`p` patches (cropping the
    * ragged right/bottom edge, the standard ViT rule), one output row
    * per patch with its grid coordinates and exact integer pixel sum —
    * the tokenization step a multimodal training pipeline runs before
    * the vision encoder (patch embeddings). The m11 oracle recomputes
    * every patch sum analytically from the synthetic pixel rule, so
    * the real PNG encode→decode→crop path is value-verified.
    *
    * Scale shape: pure flatMap over the binary column — no shuffle,
    * scan throughput; the patch fan-out is (w/p)·(h/p) rows per image,
    * bounded by image size. Undecodable payloads emit ZERO patch rows
    * (consistent with [[decodeImages]]' null contract — a malformed
    * image contributes no training tokens, never a task failure).
    */
  def imagePatches(withBin: DataFrame, p: Int = 2): DataFrame = {
    require(p >= 1 && p <= 64, s"patch size $p out of range")
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) Iterator.empty
            else {
              val raster = img.getRaster
              for {
                py <- (0 until img.getHeight / p).iterator
                px <- (0 until img.getWidth / p).iterator
              } yield {
                var sum = 0L
                var dy = 0
                while (dy < p) {
                  var dx = 0
                  while (dx < p) {
                    sum += raster.getSample(px * p + dx, py * p + dy, 0)
                    dx += 1
                  }
                  dy += 1
                }
                (id, px, py, sum)
              }
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              Iterator.empty[(Long, Int, Int, Long)]
          }
        }
      }
      .toDF("doc_id", "px", "py", "patch_sum")
  }

  /** Perceptual-hash fixture geometry: images are step functions on a
    * 9x8 logical cell grid (the dHash sampling grid), rendered at
    * pixel sizes that are exact multiples of it — so the SAME pattern
    * rendered at 18x16 and 36x24 is perceptually (and dHash-) identical
    * while being byte-wise completely different PNGs. Cell values are
    * the portable md5 hash of the cell key (the [[graft.functions
    * .Hashing.h32]] discipline), so the DuckDB oracle recomputes every
    * pixel analytically without decoding anything. Docs with
    * doc_id % [[NoiseEvery]] == 0 get one row's first three cells
    * complemented — a planted PERTURBED rendition whose dHash lands 2-3
    * bits from its clean twin (near-dup, not exact-dup).
    */
  val PatternCount = 16
  val NoiseEvery = 97

  private def cellValue(p: Int, qx: Int, qy: Int, noisy: Boolean): Int = {
    val key = (p * 72 + qy * 9 + qx).toString
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = md.take(4).map(b => f"$b%02x").mkString
    val v = (java.lang.Long.parseLong(hex, 16) % 256L).toInt
    if (noisy && qy == p % 8 && qx <= 2) 255 - v else v
  }

  /** Deterministic synthetic pattern images, REALLY encoded as PNG:
    * pattern = doc_id % 16 at w = 9*(2 + doc_id%3), h = 8*(2 + doc_id%2)
    * — the multi-resolution perceptual-dedup fixture (see [[cellValue]]).
    */
  def syntheticPatternImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Tables.spread(docs).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val p = (id % PatternCount).toInt
          val w = 9 * (2 + (id % 3).toInt)
          val h = 8 * (2 + (id % 2).toInt)
          val noisy = id % NoiseEvery == 0
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                cellValue(p, x * 9 / w, y * 8 / h, noisy))
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

  /** 64-bit difference hash (dHash) from REAL decoded pixels: decode
    * via `javax.imageio`, nearest-sample a 9x8 grid, set bit
    * qy*8 + qx when sample(qx+1, qy) > sample(qx, qy). Resolution-
    * invariant for content that is (close to) a step function on the
    * grid — the property perceptual dedup rests on. Per-partition map,
    * no shuffle; undecodable payloads are dropped (the malformed-input
    * contract: a corrupt image must never crash the hash pass).
    */
  /** 9x8-grid difference hash of a decoded image — the shared core of
    * [[dhash64]] and the per-frame hashing in [[videoFrameHashes]].
    */
  /** Area-average RESIZE (box-filter downsample) of every decoded
    * image to a fixed `gw`×`gh` grid — the thumbnail/pre-encoder
    * normalization step a multimodal pipeline runs before a vision
    * model with a fixed input size. Source pixel (x, y) maps to cell
    * (x·gw div w, y·gh div h) — the integer-division area partition,
    * one closed-form expression both engines evaluate identically —
    * and each cell reports its EXACT integer pixel sum and count, with
    * the mean as one IEEE division over those integers.
    *
    * Scale shape: pure flatMap over the binary column (no shuffle,
    * scan throughput), gw·gh rows per image; undecodable or
    * smaller-than-grid payloads emit zero rows ([[decodeImages]]'
    * malformed-input contract).
    */
  def imageResize(withBin: DataFrame, gw: Int = 2, gh: Int = 2): DataFrame = {
    require(gw >= 1 && gh >= 1 && gw <= 64 && gh <= 64,
      s"resize grid ${gw}x$gh out of range")
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null || img.getWidth < gw || img.getHeight < gh)
              Iterator.empty
            else {
              val w = img.getWidth; val h = img.getHeight
              val raster = img.getRaster
              val sums = Array.ofDim[Long](gw * gh)
              val cnts = Array.ofDim[Long](gw * gh)
              var y = 0
              while (y < h) {
                val cy = y * gh / h
                var x = 0
                while (x < w) {
                  val c = cy * gw + x * gw / w
                  sums(c) += raster.getSample(x, y, 0)
                  cnts(c) += 1L
                  x += 1
                }
                y += 1
              }
              (0 until gw * gh).iterator.map { c =>
                (id, c % gw, c / gw, cnts(c), sums(c),
                  sums(c).toDouble / cnts(c).toDouble)
              }
            }
          } catch {
            case scala.util.control.NonFatal(_) => Iterator.empty
          }
        }
      }
      .toDF("doc_id", "cx", "cy", "n_px", "px_sum", "mean_px")
  }

  private def dhashOf(img: java.awt.image.BufferedImage): Long = {
    val raster = img.getRaster
    val w = img.getWidth; val h = img.getHeight
    var hash = 0L
    var qy = 0
    while (qy < 8) {
      val sy = qy * h / 8
      var qx = 0
      while (qx < 8) {
        val a = raster.getSample(qx * w / 9, sy, 0)
        val b = raster.getSample((qx + 1) * w / 9, sy, 0)
        if (b > a) hash |= 1L << (qy * 8 + qx)
        qx += 1
      }
      qy += 1
    }
    hash
  }

  def dhash64(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) None
            else Some((id, img.getWidth, img.getHeight, dhashOf(img)))
          } catch {
            case scala.util.control.NonFatal(_) => None
          }
        }
      }
      .toDF("doc_id", "width", "height", "dhash")
  }

  // ---- video (frame container) ----------------------------------------

  val VideoFrames = 12

  /** Deterministic synthetic "videos", REALLY encoded: a length-
    * prefixed frame container (Int nFrames, then per frame Int length +
    * a real PNG — the demuxer-plus-codec shape of any video pipeline,
    * minus inter-frame compression). doc_id encodes (video = doc_id
    * div 2, rendition = doc_id % 2): both renditions carry the SAME
    * pattern sequence (video + j) % 16 for frame j, at DIFFERENT
    * resolutions, and rendition 1 perturbs exactly one frame
    * (j = video % nFrames, the [[cellValue]] noisy rule) — the
    * re-encoded-with-a-glitch near-duplicate every video dedup must
    * still catch.
    */
  def syntheticVideos(docs: DataFrame, nFrames: Int = VideoFrames): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Tables.spread(docs).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val vid = id / 2
          val r = (id % 2).toInt
          val w = 9 * (2 + r)
          val h = 8 * 2
          val bos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(bos)
          out.writeInt(nFrames)
          var j = 0
          while (j < nFrames) {
            val p = ((vid + j) % PatternCount).toInt
            val noisy = r == 1 && j == (vid % nFrames)
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0,
                  cellValue(p, x * 9 / w, y * 8 / h, noisy))
                x += 1
              }
              y += 1
            }
            val fb = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", fb)
            val bytes = fb.toByteArray
            out.writeInt(bytes.length)
            out.write(bytes)
            j += 1
          }
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Shot-structured synthetic videos (same container format as
    * [[syntheticVideos]], REAL PNG frames): `nFrames` frames in
    * consecutive SHOTS of `shotLen` identical-pattern frames — pattern
    * = (vid + j/shotLen) % [[PatternCount]] — so shot boundaries are
    * the only visual cuts. Resolution still varies by doc parity (the
    * dHash grid is resolution-invariant); no noise rows: this fixture
    * isolates temporal structure, [[syntheticVideos]] isolates
    * perturbation.
    */
  def syntheticShotVideos(docs: DataFrame, nFrames: Int = VideoFrames,
                          shotLen: Int = 4): DataFrame = {
    require(shotLen >= 1, "shotLen >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Tables.spread(docs).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val vid = id / 2
          val r = (id % 2).toInt
          val w = 9 * (2 + r)
          val h = 8 * 2
          val bos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(bos)
          out.writeInt(nFrames)
          var j = 0
          while (j < nFrames) {
            val p = ((vid + j / shotLen) % PatternCount).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0,
                  cellValue(p, x * 9 / w, y * 8 / h, noisy = false))
                x += 1
              }
              y += 1
            }
            val fb = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", fb)
            val bytes = fb.toByteArray
            out.writeInt(bytes.length)
            out.write(bytes)
            j += 1
          }
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Within-video keyframe selection over the sampled-frame dHash
    * sequence: a frame is a keyframe when its hash differs from the
    * previous SAMPLED frame's (shot-boundary proxy; frame 0 always
    * is). One demux/decode pass ([[videoFrameHashes]]) + one per-video
    * window — the temporal-redundancy pruning step a multimodal
    * training pipeline runs before embedding frames (only keyframes
    * reach the expensive encoder). Per-video state is its own sampled
    * frames, so the window never skews.
    */
  def keyframes(videos: DataFrame, sampleEvery: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    videoFrameHashes(videos, sampleEvery)
      .withColumn("prev", lag(col("dhash"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("dhash"))
      .select(col("doc_id"), col("frame_idx"), col("dhash"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Demux + frame-sample + per-frame dHash: parse the container, keep
    * every `sampleEvery`-th frame, decode the REAL PNG, hash with the
    * shared 9x8 grid rule. Per-partition map, no shuffle; truncated or
    * undecodable containers contribute only their parseable prefix
    * (the malformed-input contract). Output: (doc_id, frame_idx,
    * dhash) — the persisted video-fingerprint table at scale.
    */
  def videoFrameHashes(videos: DataFrame, sampleEvery: Int): DataFrame = {
    require(sampleEvery >= 1, "sampleEvery >= 1")
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val in = new java.io.DataInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val n = in.readInt()
            (0 until n).iterator.flatMap { j =>
              val len = in.readInt()
              val fb = new Array[Byte](len)
              in.readFully(fb)
              if (j % sampleEvery != 0) None
              else {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(fb))
                if (img == null) None else Some((id, j, dhashOf(img)))
              }
            }.toList
          } catch {
            case scala.util.control.NonFatal(_) => Nil
          }
        }
      }
      .toDF("doc_id", "frame_idx", "dhash")
  }

  /** Video near-dup via sampled-frame fingerprint agreement: candidate
    * pairs share >= minMatches (frame_idx, dhash) sampled frames — an
    * equi-join on the fingerprint table, never a payload comparison.
    * The dHash grid is resolution-invariant on grid-step content, so
    * re-encodes at other resolutions match exactly and a perturbed
    * frame costs one agreement (catchable by minMatches < samples).
    */
  def videoFrameDup(videos: DataFrame, sampleEvery: Int,
                    minMatches: Long): DataFrame = {
    val fp = videoFrameHashes(videos, sampleEvery)
    fp.as("a").join(fp.as("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
        col("a.dhash") === col("b.dhash") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).cast("long").as("n_matches"))
      .filter(col("n_matches") >= minMatches)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---- audio -----------------------------------------------------------

  val AudioRate = 8000

  /** Canonical 44-byte RIFF/WAVE header + PCM16LE mono payload. */
  private def wavBytes(samples: Array[Byte], rate: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length)
      .put(samples)
    bb.array()
  }

  /** Deterministic synthetic audio, REALLY encoded as RIFF/WAVE PCM16
    * mono at [[AudioRate]] Hz: per doc, n = 256 + (doc_id%7)*64 samples
    * with sample i = ((doc_id*31 + i*7) % 2001) - 1000 — analytically
    * known content, so the DuckDB oracle verifies the real codec
    * round-trip (encode here, `javax.sound.sampled` decode in
    * [[decodeAudio]]) value-for-value by regenerating the samples from
    * the formula, without touching a byte of WAV itself.
    */
  def syntheticAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Tables.spread(docs).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = (256 + (id % 7) * 64).toInt
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = (((id * 31 + i.toLong * 7) % 2001) - 1000).toInt
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          (id, wavBytes(data, AudioRate))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` (JDK-bundled
    * WAV support) per partition — the header yields the sample rate,
    * the stream yields PCM16LE frames, and the features are exact
    * integers over the decoded samples: count, energy (sum of squared
    * amplitudes) and zero crossings (sign flips between consecutive
    * samples, 0 counted as non-negative). Undecodable payloads yield
    * null feature columns, never a task failure — same malformed-input
    * contract as [[decodeImages]].
    */
  def decodeAudio(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val rate = fmt.getSampleRate.toInt
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            var sumSq = 0L
            var zc = 0L
            var prevNonNeg = true
            var i = 0
            while (i < n) {
              val v = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
              sumSq += v.toLong * v
              val nonNeg = v >= 0
              if (i > 0 && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg
              i += 1
            }
            (id, Some(rate), Some(n.toLong), Some(sumSq), Some(zc))
          } catch {
            case scala.util.control.NonFatal(_) =>
              (id, None: Option[Int], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "sum_sq", "n_zero_cross")
  }

  /** Audio RESAMPLE (decimation by 2 with pair averaging) over REAL
    * WAV decode — the sample-rate normalization an audio training
    * pipeline runs before a fixed-rate encoder, the [[imageResize]]
    * contract applied to audio. out[j] = (v[2j] + v[2j+1]) >> 1: the
    * arithmetic right shift IS floor division by 2 (exact for
    * negative sums too — the w32/holt floor discipline), a trailing
    * odd sample is dropped, and the reported features (output count,
    * energy, zero crossings of the DECIMATED signal) are exact
    * integers. Pure map over the binary column; undecodable payloads
    * yield null features ([[decodeAudio]]'s contract).
    *
    * Output: (doc_id, n_in, n_out, sum_sq_out, n_zero_cross_out).
    */
  def audioResample(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            def sample(i: Int): Int =
              ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
            val m = n / 2
            var sumSq = 0L
            var zc = 0L
            var prevNonNeg = true
            var j = 0
            while (j < m) {
              val v = (sample(2 * j) + sample(2 * j + 1)) >> 1
              sumSq += v.toLong * v
              val nonNeg = v >= 0
              if (j > 0 && nonNeg != prevNonNeg) zc += 1
              prevNonNeg = nonNeg
              j += 1
            }
            (id, Some(n.toLong), Some(m.toLong), Some(sumSq), Some(zc))
          } catch {
            case scala.util.control.NonFatal(_) =>
              (id, None: Option[Long], None: Option[Long],
                None: Option[Long], None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "n_in", "n_out", "sum_sq_out", "n_zero_cross_out")
  }

  /** Energy-based audio segmentation (the VAD shape): REAL WAV decode,
    * fixed `windowSamples`-sample frames, per-frame energy = exact
    * integer sum of squared amplitudes, frames above
    * `energyThreshold` are "active", and consecutive active frames
    * merge into segments via a per-doc gaps-and-islands window. The
    * speech/music-extraction front gate of an audio training
    * pipeline: only active segments reach the expensive encoder
    * (the [[keyframes]] contract, applied to audio). Output:
    * (doc_id, start_win, n_windows, seg_energy). All integers —
    * hash-verifiable against an oracle that regenerates the samples
    * analytically. Undecodable payloads contribute no frames.
    */
  def audioEnergySegments(withBin: DataFrame, windowSamples: Int,
                          energyThreshold: Long): DataFrame = {
    require(windowSamples >= 1, "windowSamples >= 1")
    val spark = withBin.sparkSession
    import spark.implicits._
    val frames = withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long)]
            var w = 0
            while (w * windowSamples < n) {
              var e = 0L
              var i = w * windowSamples
              val end = math.min(n, (w + 1) * windowSamples)
              while (i < end) {
                val v = ((raw(2 * i) & 0xff) |
                  (raw(2 * i + 1) << 8)).toShort.toInt
                e += v.toLong * v
                i += 1
              }
              out += ((id, w.toLong, e))
              w += 1
            }
            out
          } catch {
            case scala.util.control.NonFatal(_) => Nil
          }
        }
      }
      .toDF("doc_id", "win", "energy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("win"))
    frames.filter(col("energy") > energyThreshold)
      .withColumn("grp", col("win") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("win")).as("start_win"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("seg_energy"))
      .select(col("doc_id"), col("start_win"), col("n_windows"),
        col("seg_energy"))
      .orderBy(col("doc_id"), col("start_win"))
  }

  /** Audio-fingerprint fixture geometry (the [[syntheticPatternImages]]
    * discipline applied to audio): waveforms are step functions on
    * [[AudioWindows]] fixed 8-sample windows whose step heights are the
    * portable md5 hash of the window key, rendered at per-doc AMPLITUDE
    * 1-3x — so the same pattern at different amplitudes is byte-wise
    * completely different WAV while its energy-delta fingerprint is
    * identical (energies scale by amp^2 uniformly; the comparisons
    * don't move). Docs with doc_id % [[NoiseEvery]] == 0 get one
    * pattern-determined window boosted — a planted PERTURBED rendition
    * 0-2 fingerprint bits from its clean twins.
    */
  val AudioPatterns = 16
  val AudioWindows = 65 // 64 energy-delta bits
  val AudioWinSamples = 8

  private def h32OfString(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
  }

  /** Step height of window w for pattern p (before amplitude). */
  private def audioStep(p: Int, w: Int, noisy: Boolean): Int = {
    val a0 = (100 + h32OfString((p * AudioWindows + w).toString) % 900).toInt
    if (noisy && w == (p % 64) + 1) a0 + 1000 else a0
  }

  /** Deterministic multi-rendition synthetic audio, REALLY encoded as
    * WAV: pattern = doc_id % 16, amplitude = 1 + (doc_id div 16) % 3,
    * 65 windows x 8 samples of constant value step*amp (max 5997 —
    * safely inside int16).
    */
  def syntheticAudioRenditions(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Tables.spread(docs).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val p = (id % AudioPatterns).toInt
          val amp = 1 + ((id / AudioPatterns) % 3).toInt
          val noisy = id % NoiseEvery == 0
          val n = AudioWindows * AudioWinSamples
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = audioStep(p, i / AudioWinSamples, noisy) * amp
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          (id, wavBytes(data, AudioRate))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** 64-bit audio energy-delta fingerprint from a REAL
    * `javax.sound.sampled` decode: bit k = 1 iff the (k+1)-th 8-sample
    * window's energy (exact integer sum of squared amplitudes) exceeds
    * the k-th's — the dHash gradient-sign idea on the time axis, and
    * like it invariant under uniform amplitude scaling. Works on any
    * PCM16 WAV (bits cap at min(windows-1, 64)); undecodable payloads
    * yield a null fingerprint.
    */
  def audioFingerprint64(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val raw = ais.readAllBytes()
            val n = raw.length / 2
            val nw = n / AudioWinSamples
            val e = new Array[Long](nw)
            var i = 0
            while (i < nw * AudioWinSamples) {
              val v = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
              e(i / AudioWinSamples) += v.toLong * v
              i += 1
            }
            var fp = 0L
            var k = 0
            while (k < math.min(nw - 1, 64)) {
              if (e(k + 1) > e(k)) fp |= 1L << k
              k += 1
            }
            (id, Some(fp))
          } catch {
            case scala.util.control.NonFatal(_) => (id, None: Option[Long])
          }
        }
      }
      .toDF("doc_id", "fp")
  }

  /** Deterministic EXIF-ish header plant for [[exifPrivacyAudit]] (the
    * t35/m03 synthetic discipline applied to media metadata): each
    * doc's binary payload gains a closed-form ASCII header by
    * doc_id % 4 — class 1 carries a GPS block (`EXIF;GPS=lat,lon;`
    * with lat = id%180−90, lon = (id·7)%360−180), class 3 a benign
    * camera tag (`EXIF;CAM=fx9;`), others no EXIF at all — then the
    * `IMG;`-prefixed image bytes. ASCII by construction so byte and
    * char lengths coincide and an oracle replays every value.
    */
  def exifPlant(docs: DataFrame): DataFrame = {
    val gps = concat(lit("EXIF;GPS="),
      (col("doc_id") % 180 - 90).cast("string"), lit(","),
      ((col("doc_id") * 7) % 360 - 180).cast("string"), lit(";IMG;"),
      col("text"))
    val cam = concat(lit("EXIF;CAM=fx9;IMG;"), col("text"))
    val bare = concat(lit("IMG;"), col("text"))
    graft.core.Tables.spread(docs)
      .withColumn("payload", encode(
        when(col("doc_id") % 4 === 1, gps)
          .when(col("doc_id") % 4 === 3, cam)
          .otherwise(bare), "UTF-8"))
      .withColumn("media_meta", struct(
        length(col("payload")).as("n_bytes"),
        lit("fake/exif").as("mime"),
        md5(col("payload")).as("checksum")))
  }

  /** GPS-bearing payload detection + scrub — the t11 PII discipline
    * extended to image metadata: location EXIF is the PII class media
    * corpora leak most (a training set of user photos must not carry
    * coordinates). Per doc: has_exif / has_gps flags, the GPS block
    * stripped from the payload (everything else byte-preserved), and
    * exact before/after byte lengths. The header here is ASCII so the
    * detection/scrub are portable string expressions; a REAL EXIF/TIFF
    * walker is a per-partition byte scanner in the [[decodeBatched]]
    * codec-injection shape — flags, scrub contract, schema and the
    * audit rollup stay identical.
    *
    * [[exifPrivacyAudit]] rolls up per source: doc/exif/gps counts and
    * exact original/scrubbed/removed byte totals — one narrow map +
    * one partial-aggregable groupBy, scan speed at any corpus size.
    */
  def exifGpsScrub(withBin: DataFrame): DataFrame = {
    val s = decode(col("payload"), "UTF-8")
    withBin
      .withColumn("has_exif", s.startsWith("EXIF;"))
      .withColumn("has_gps", s.contains("GPS="))
      .withColumn("payload_scrubbed",
        encode(regexp_replace(s, "GPS=[^;]*;", ""), "UTF-8"))
      .withColumn("orig_bytes", length(col("payload")).cast("long"))
      .withColumn("scrubbed_bytes",
        length(col("payload_scrubbed")).cast("long"))
  }

  def exifPrivacyAudit(docs: DataFrame): DataFrame =
    exifGpsScrub(exifPlant(docs))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("has_exif"), 1L).otherwise(0L)).as("n_exif"),
        sum(when(col("has_gps"), 1L).otherwise(0L)).as("n_gps"),
        sum(col("orig_bytes")).as("orig_bytes"),
        sum(col("scrubbed_bytes")).as("scrubbed_bytes"),
        sum(col("orig_bytes") - col("scrubbed_bytes")).as("removed_bytes"))
      .orderBy(col("source"))

  // ---- m16: REAL EXIF/TIFF byte-walker -----------------------------
  //
  // m15's ASCII plant declared the production shape; this IS it: real
  // TIFF payloads (II/MM byte-order mark, magic 42, IFD0 entry table,
  // inline SHORT/LONG values, a GPS sub-IFD behind the 0x8825 pointer
  // tag, strip data behind StripOffsets 0x0111 — TIFF 6.0 §2, the
  // container EXIF embeds) and a per-partition byte scanner in the
  // [[decodeBatched]] codec-injection pattern. The fixture is
  // closed-form over doc_id (the m03 PNG discipline), so the oracle
  // verifies the audit's byte totals analytically without parsing a
  // single TIFF.

  /** TIFF type sizes (TIFF 6.0 §2: BYTE/ASCII 1, SHORT 2, LONG 4,
    * RATIONAL 8) — a value lives inline in the 4-byte field iff
    * size(type)·count <= 4, else the field holds an offset.
    */
  private val TiffTypeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8)

  /** One synthetic TIFF, closed-form over doc_id: endianness II when
    * id % 3 != 0, MM otherwise (coprime to the id % 4 GPS class, so
    * the scrub's offset patching runs under BOTH byte orders); IFD0
    * carries ImageWidth 0x0100 (SHORT,
    * w = 4 + id%13), ImageLength 0x0101 (SHORT, h = 3 + id%7),
    * StripOffsets 0x0111 (LONG → the w·h strip, pixel i =
    * (id·31 + i) % 256), plus — by id % 4 — a benign Software tag
    * 0x0131 (SHORT, 9) on class 3 or a GPSInfo pointer 0x8825 (LONG →
    * a trailing GPS IFD: GPSLatitude 0x0002 = lat+90, GPSLongitude
    * 0x0004 = lon+180 as inline LONGs, lat = id%180−90,
    * lon = (id·7)%360−180) on class 1. Tags ascend as TIFF requires;
    * the GPS IFD is the file tail. Layout arithmetic (the oracle's
    * closed form): orig = 8 + 2 + 12n + 4 + w·h + (gps ? 30 : 0) with
    * n = 3 + [class∈{1,3}]; scrub removes 12 + 30 = 42 bytes.
    */
  private[graft] def tiffBytes(id: Long): Array[Byte] = {
    val le = id % 3 != 0
    val w = 4 + (id % 13).toInt
    val h = 3 + (id % 7).toInt
    val cls = (id % 4).toInt
    val n = 3 + (if (cls == 1 || cls == 3) 1 else 0)
    val stripOff = 8 + 2 + 12 * n + 4
    val gpsOff = stripOff + w * h
    val total = gpsOff + (if (cls == 1) 30 else 0)
    val b = new Array[Byte](total)
    def pu16(p: Int, v: Int): Unit =
      if (le) { b(p) = v.toByte; b(p + 1) = (v >> 8).toByte }
      else { b(p) = (v >> 8).toByte; b(p + 1) = v.toByte }
    def pu32(p: Int, v: Int): Unit =
      if (le) { var i = 0; while (i < 4) { b(p + i) = (v >> (8 * i)).toByte; i += 1 } }
      else { var i = 0; while (i < 4) { b(p + 3 - i) = (v >> (8 * i)).toByte; i += 1 } }
    b(0) = (if (le) 'I' else 'M').toByte; b(1) = b(0)
    pu16(2, 42); pu32(4, 8)
    pu16(8, n)
    // entry writer: SHORT values left-justify in the 4-byte field
    def entry(pos: Int, tag: Int, typ: Int, v: Int): Unit = {
      pu16(pos, tag); pu16(pos + 2, typ); pu32(pos + 4, 1)
      if (typ == 3) pu16(pos + 8, v) else pu32(pos + 8, v)
    }
    entry(10, 0x0100, 3, w)
    entry(22, 0x0101, 3, h)
    entry(34, 0x0111, 4, stripOff)
    if (cls == 3) entry(46, 0x0131, 3, 9)
    if (cls == 1) entry(46, 0x8825, 4, gpsOff)
    pu32(10 + 12 * n, 0) // next-IFD
    var i = 0
    while (i < w * h) { b(stripOff + i) = ((id * 31 + i) % 256).toByte; i += 1 }
    if (cls == 1) {
      val lat = (id % 180 - 90).toInt; val lon = ((id * 7) % 360 - 180).toInt
      pu16(gpsOff, 2)
      entry(gpsOff + 2, 0x0002, 4, lat + 90)
      entry(gpsOff + 14, 0x0004, 4, lon + 180)
      pu32(gpsOff + 26, 0)
    }
    b
  }

  /** Deterministic real-TIFF payloads (doc_id, source, payload) —
    * encoded per partition like any real payload producer.
    */
  def syntheticTiffs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Tables.spread(docs).select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, src) =>
        (id, src, tiffBytes(id)) })
      .toDF("doc_id", "source", "payload")
  }

  /** Parse + scrub ONE TIFF payload: walks the byte-order mark, magic,
    * IFD0 entry table (endianness-correct u16/u32, SHORT values read
    * from the left-justified half of the value field); when a GPSInfo
    * pointer 0x8825 is present, removes the 12-byte pointer entry AND
    * the GPS sub-IFD it targets, decrements the entry count, and
    * shifts every offset-semantic value (StripOffsets 0x0111 here —
    * offset semantics are TAG knowledge, exactly as in exiftool) that
    * points past a removed region — emitting a VALID, re-walkable
    * TIFF. Fails loudly on a foreign BOM/magic or a truncated table:
    * a scrubber that silently passes bytes it cannot parse LEAKS.
    * Returns (endian, width, height, hasExtraTag, gps lat/lon or
    * null, scrubbed payload).
    */
  private[graft] def tiffWalkScrub(bytes: Array[Byte])
      : (String, Int, Int, Boolean, Option[(Int, Int)], Array[Byte]) = {
    require(bytes.length >= 8, "tiff: truncated header")
    val le = (bytes(0).toChar, bytes(1).toChar) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => throw new IllegalArgumentException(
        "tiff: unknown byte-order mark")
    }
    def u16(p: Int): Int =
      if (le) (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8)
      else ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF)
    def u32(p: Int): Int =
      if (le) u16(p) | (u16(p + 2) << 16) else (u16(p) << 16) | u16(p + 2)
    require(u16(2) == 42, "tiff: bad magic")
    val ifd0 = u32(4)
    require(ifd0 + 2 <= bytes.length, "tiff: truncated IFD offset")
    val n = u16(ifd0)
    require(ifd0 + 2 + 12 * n + 4 <= bytes.length, "tiff: truncated IFD")
    case class E(pos: Int, tag: Int, typ: Int, cnt: Int, raw: Int)
    val entries = (0 until n).map { i =>
      val p = ifd0 + 2 + 12 * i
      val typ = u16(p + 2)
      val inlineShort = typ == 3 && u32(p + 4) == 1
      E(p, u16(p), typ, u32(p + 4),
        if (inlineShort) u16(p + 8) else u32(p + 8))
    }
    def tag(t: Int): Option[E] = entries.find(_.tag == t)
    val width = tag(0x0100).map(_.raw).getOrElse(0)
    val height = tag(0x0101).map(_.raw).getOrElse(0)
    val hasExtra = tag(0x0131).nonEmpty
    val gpsE = tag(0x8825)
    val gps = gpsE.map { e =>
      val g = e.raw
      require(g + 2 <= bytes.length, "tiff: truncated GPS IFD")
      val gn = u16(g)
      require(g + 2 + 12 * gn + 4 <= bytes.length, "tiff: truncated GPS IFD")
      val gents = (0 until gn).map { i =>
        val p = g + 2 + 12 * i; u16(p) -> u32(p + 8)
      }.toMap
      (gents.getOrElse(0x0002, 90) - 90, gents.getOrElse(0x0004, 180) - 180)
    }
    val scrubbed = gpsE match {
      case None => bytes
      case Some(e) =>
        val g = e.raw
        val gLen = 2 + 12 * u16(g) + 4
        // removed regions: the pointer entry + the GPS IFD block
        val cut = Seq((e.pos, 12), (g, gLen)).sortBy(_._1)
        val out = new Array[Byte](bytes.length - 12 - gLen)
        var src = 0; var dst = 0
        cut.foreach { case (s, l) =>
          System.arraycopy(bytes, src, out, dst, s - src)
          dst += s - src; src = s + l
        }
        System.arraycopy(bytes, src, out, dst, bytes.length - src)
        def shift(off: Int): Int =
          off - cut.takeWhile(_._1 < off).map(_._2).sum
        def ou16(p: Int, v: Int): Unit =
          if (le) { out(p) = v.toByte; out(p + 1) = (v >> 8).toByte }
          else { out(p) = (v >> 8).toByte; out(p + 1) = v.toByte }
        def ou32(p: Int, v: Int): Unit =
          if (le) { var i = 0; while (i < 4) { out(p + i) = (v >> (8 * i)).toByte; i += 1 } }
          else { var i = 0; while (i < 4) { out(p + 3 - i) = (v >> (8 * i)).toByte; i += 1 } }
        ou16(shift(ifd0), n - 1)
        // offset-semantic tags: patch values pointing past a removed
        // region (StripOffsets; plus any non-inline value field)
        entries.filter(_.tag != 0x8825).foreach { en =>
          val isOffset = en.tag == 0x0111 ||
            TiffTypeSize.getOrElse(en.typ, 1) * en.cnt > 4
          if (isOffset && en.raw != shift(en.raw))
            ou32(shift(en.pos) + 8, shift(en.raw))
        }
        out
    }
    (if (le) "II" else "MM", width, height, hasExtra, gps, scrubbed)
  }

  /** Per-doc TIFF privacy scrub — the [[decodeBatched]] shape: one
    * mapPartitions, no shuffle; flags + parsed geometry + GPS + exact
    * byte lengths + the scrubbed payload.
    */
  def tiffGpsScrub(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init site for a real EXIF library goes here
        it.map { case (id, src, b) =>
          val (endian, w, h, extra, gps, out) = tiffWalkScrub(b)
          (id, src, endian, w, h, extra, gps.nonEmpty,
            gps.map(_._1), gps.map(_._2),
            b.length.toLong, out.length.toLong, out)
        }
      }
      .toDF("doc_id", "source", "endian", "width", "height", "has_extra",
        "has_gps", "gps_lat", "gps_lon", "orig_bytes", "scrubbed_bytes",
        "payload_scrubbed")
  }

  /** m16: the m15 audit schema over REAL TIFF payloads, plus the parse
    * proofs (endianness counts, geometry sum) the byte-walker makes
    * checkable — one narrow mapPartitions + one partial-aggregable
    * groupBy.
    */
  def tiffPrivacyAudit(docs: DataFrame): DataFrame =
    tiffGpsScrub(syntheticTiffs(docs))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("endian") === "II", 1L).otherwise(0L)).as("n_le"),
        sum(when(col("has_extra") || col("has_gps"), 1L).otherwise(0L))
          .as("n_exif"),
        sum(when(col("has_gps"), 1L).otherwise(0L)).as("n_gps"),
        sum(col("width").cast("long") * col("height")).as("wh_sum"),
        sum(col("orig_bytes")).as("orig_bytes"),
        sum(col("scrubbed_bytes")).as("scrubbed_bytes"),
        sum(col("orig_bytes") - col("scrubbed_bytes")).as("removed_bytes"))
      .orderBy(col("source"))

  // ---- m17: JPEG APP1/EXIF scrub through the TIFF walker ------------
  //
  // m16's byte-walker operates on bare TIFF payloads; real crawl images
  // carry EXIF as a TIFF blob inside a JPEG APP1 segment (JEITA
  // CP-3451 / EXIF 2.3 §4.5.4: marker 0xFFE1, 2-byte big-endian length
  // covering itself, the 6-byte "Exif\0\0" identifier, then the TIFF).
  // m17 composes the JPEG segment scanner with [[tiffWalkScrub]]: find
  // APP1-Exif among the segments, scrub the embedded TIFF surgically,
  // PATCH the APP1 length (always big-endian, whatever the TIFF's own
  // byte order says), and re-emit a valid JPEG. Foreign or truncated
  // bytes fail loudly — the m16 contract.

  /** "Exif\0\0" — the APP1 payload identifier (EXIF 2.3 §4.5.4). */
  private val ExifId: Array[Byte] =
    Array('E'.toByte, 'x'.toByte, 'i'.toByte, 'f'.toByte, 0, 0)

  /** One synthetic EXIF-bearing JPEG, closed-form over doc_id: SOI,
    * then — on the id % 4 EXIF classes 1/3 only — an APP1 segment
    * wrapping [[tiffBytes]] (so the embedded TIFF inherits m16's whole
    * closed form: II/MM by id % 3, GPS on class 1, Software tag on
    * class 3), then a COM segment (the non-APP1 segment the scanner
    * must skip, fixed 5-byte "graft" comment), then EOI. Layout
    * arithmetic: orig = 2 + (exif ? 10 + tiff_len : 0) + 9 + 2 with
    * tiff_len = 14 + 12n + w·h + (gps ? 30 : 0); scrub removes the
    * same 42 bytes the bare-TIFF scrub removes.
    */
  private[graft] def jpegExifBytes(id: Long): Array[Byte] = {
    val cls = (id % 4).toInt
    val app1 = if (cls == 1 || cls == 3) {
      val tiff = tiffBytes(id)
      val len = 2 + 6 + tiff.length // the length field covers itself
      Array(0xFF.toByte, 0xE1.toByte,
        ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ ExifId ++ tiff
    } else Array.empty[Byte]
    val com = "graft".getBytes("US-ASCII")
    val comSeg = Array(0xFF.toByte, 0xFE.toByte, 0.toByte,
      (2 + com.length).toByte) ++ com
    Array(0xFF.toByte, 0xD8.toByte) ++ app1 ++ comSeg ++
      Array(0xFF.toByte, 0xD9.toByte)
  }

  /** Deterministic EXIF-JPEG payloads (doc_id, source, payload). */
  def syntheticExifJpegs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.core.Tables.spread(docs).select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, src) =>
        (id, src, jpegExifBytes(id)) })
      .toDF("doc_id", "source", "payload")
  }

  /** Parse + scrub ONE JPEG: validate SOI, walk the segment chain
    * (standalone markers length-free, every other segment's big-endian
    * length covering itself — ISO/IEC 10918-1 §B.1.1.4), locate the
    * APP1 segment carrying "Exif\0\0", run [[tiffWalkScrub]] on the
    * embedded TIFF, patch the APP1 length field, splice. Non-APP1
    * segments pass through byte-identically; a GPS-free JPEG returns
    * the input array unchanged. Fails loudly on a missing SOI,
    * misaligned marker, overrunning segment, bytes after EOI, or a
    * DUPLICATE APP1-Exif segment (scrubbing one and passing the other
    * would leak) — and on anything [[tiffWalkScrub]] rejects inside
    * the APP1.
    * Returns (has_exif, parsed TIFF facts or None, scrubbed bytes).
    */
  private[graft] def jpegWalkScrub(bytes: Array[Byte])
      : (Boolean,
         Option[(String, Int, Int, Boolean, Option[(Int, Int)])],
         Array[Byte]) = {
    require(bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "jpeg: missing SOI")
    var p = 2
    var app1Pos = -1
    var app1Len = 0
    var done = false
    while (!done) {
      require(p + 2 <= bytes.length, "jpeg: truncated marker")
      require((bytes(p) & 0xFF) == 0xFF, "jpeg: misaligned marker")
      val m = bytes(p + 1) & 0xFF
      if (m == 0xD9) { // EOI
        require(p + 2 == bytes.length, "jpeg: bytes after EOI")
        done = true
      } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
        p += 2 // standalone marker, no length field
      } else {
        require(p + 4 <= bytes.length, "jpeg: truncated segment length")
        val len = ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF)
        require(len >= 2 && p + 2 + len <= bytes.length,
          "jpeg: segment overruns buffer")
        if (m == 0xE1 && len >= 2 + ExifId.length &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(bytes, p + 4, p + 4 + 6), ExifId)) {
          // duplicate APP1-Exif segments are out of contract, LOUDLY:
          // scrubbing only one of them would silently leak the other's
          // GPS in output labeled "scrubbed" — the exact failure mode
          // the loud-fail discipline exists to prevent
          require(app1Pos < 0,
            "jpeg: multiple APP1 Exif segments — refusing to scrub " +
              "(a missed duplicate would leak)")
          app1Pos = p; app1Len = len
        }
        p += 2 + len
      }
    }
    if (app1Pos < 0) (false, None, bytes)
    else {
      val tiff = java.util.Arrays.copyOfRange(
        bytes, app1Pos + 10, app1Pos + 2 + app1Len)
      val (endian, w, h, extra, gps, tiffOut) = tiffWalkScrub(tiff)
      val facts = Some((endian, w, h, extra, gps))
      if (tiffOut.length == tiff.length) (true, facts, bytes)
      else {
        val newLen = 2 + 6 + tiffOut.length
        val out = new Array[Byte](
          bytes.length - (tiff.length - tiffOut.length))
        System.arraycopy(bytes, 0, out, 0, app1Pos + 2)
        out(app1Pos + 2) = ((newLen >> 8) & 0xFF).toByte // APP1 length is
        out(app1Pos + 3) = (newLen & 0xFF).toByte // ALWAYS big-endian
        System.arraycopy(ExifId, 0, out, app1Pos + 4, 6)
        System.arraycopy(tiffOut, 0, out, app1Pos + 10, tiffOut.length)
        val tailPos = app1Pos + 2 + app1Len
        System.arraycopy(bytes, tailPos, out, app1Pos + 10 + tiffOut.length,
          bytes.length - tailPos)
        (true, facts, out)
      }
    }
  }

  /** Per-doc JPEG EXIF privacy scrub — the [[tiffGpsScrub]] shape: one
    * mapPartitions, no shuffle; flags + embedded-TIFF facts + exact
    * byte lengths + the scrubbed JPEG.
    */
  def jpegGpsScrub(withBin: DataFrame): DataFrame = {
    val spark = withBin.sparkSession
    import spark.implicits._
    withBin.select(col("doc_id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, src, b) =>
          val (hasExif, facts, out) = jpegWalkScrub(b)
          (id, src, hasExif, facts.map(_._1), facts.map(_._2),
            facts.map(_._3), facts.exists(_._5.nonEmpty),
            facts.flatMap(_._5).map(_._1), facts.flatMap(_._5).map(_._2),
            b.length.toLong, out.length.toLong, out)
        }
      }
      .toDF("doc_id", "source", "has_exif", "endian", "width", "height",
        "has_gps", "gps_lat", "gps_lon", "orig_bytes", "scrubbed_bytes",
        "payload_scrubbed")
  }

  /** m17: the m16 audit schema over EXIF-in-JPEG payloads — endianness
    * and geometry now only provable on the EXIF-bearing classes (the
    * others carry no TIFF at all); one narrow mapPartitions + one
    * partial-aggregable groupBy.
    */
  def jpegPrivacyAudit(docs: DataFrame): DataFrame =
    jpegGpsScrub(syntheticExifJpegs(docs))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("endian") === "II", 1L).otherwise(0L)).as("n_le"),
        sum(when(col("has_exif"), 1L).otherwise(0L)).as("n_exif"),
        sum(when(col("has_gps"), 1L).otherwise(0L)).as("n_gps"),
        sum(coalesce(col("width").cast("long") * col("height"), lit(0L)))
          .as("wh_sum"),
        sum(col("orig_bytes")).as("orig_bytes"),
        sum(col("scrubbed_bytes")).as("scrubbed_bytes"),
        sum(col("orig_bytes") - col("scrubbed_bytes")).as("removed_bytes"))
      .orderBy(col("source"))

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
