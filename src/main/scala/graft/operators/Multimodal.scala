package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One decoded media row: deterministic pseudo-features derived from the
  * payload's md5 (see [[Multimodal.decodeAndFeaturize]]). */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    feature: Array[Float])

/** A media decoder + feature extractor: payload bytes in, fixed-width
  * feature vector out. Implementations MUST be Serializable (they ship to
  * executors inside the mapPartitions closure) and deterministic.
  * This is the codec boundary: a production deployment drops in a
  * libjpeg/ffmpeg-backed implementation without touching the Spark plan. */
trait Featurizer extends Serializable {
  def featureDim: Int
  def featurize(bytes: Array[Byte]): Array[Float]
}

/** Deterministic stand-in featurizer and the ORACLE DEFAULT: feature j
  * derives from 6 hex digits of md5(payload) at offset 2j, scaled to
  * [0, 1) — reproducible in any engine with md5, so the SQL oracle replays
  * it exactly. Real decoders ([[PpmFeaturizer]], [[ImageIoFeaturizer]])
  * plug in for formats with actual codecs; this one covers everything
  * else (audio/video containers) and keeps q28 hash-checked. */
object Md5Featurizer extends Featurizer {
  val featureDim = 8
  def featurize(bytes: Array[Byte]): Array[Float] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    Array.tabulate(featureDim) { j =>
      val v = java.lang.Long.parseLong(hex.substring(2 * j, 2 * j + 6), 16)
      (v % 1000L).toFloat / 1000.0f
    }
  }
}

/** A REAL (if minimal) image decoder proving the codec boundary: binary
  * PPM (P6) — ASCII header `P6 <w> <h> <maxval>` then w·h RGB byte
  * triples. Features: width, height, maxval, mean R/G/B scaled by maxval,
  * pixel count, aspect ratio. Malformed payloads featurize to zeros
  * (corrupt media must not kill a 100 TB scan — same policy as the
  * reference's silent index-skip, core/data_structures.py:118). */
object PpmFeaturizer extends Featurizer {
  val featureDim = 8
  def featurize(bytes: Array[Byte]): Array[Float] = {
    try {
      require(bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6')
      var pos = 2
      def nextInt(): Int = {
        while (pos < bytes.length &&
          (bytes(pos).toChar.isWhitespace ||
            bytes(pos) == '#' && { // comment line
              while (pos < bytes.length && bytes(pos) != '\n') pos += 1
              true
            })) pos += 1
        var v = 0
        while (pos < bytes.length && bytes(pos).toChar.isDigit) {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      pos += 1 // single whitespace after maxval, per spec
      // maxval > 255 means 2-byte samples (legal P6, up to 65535) — this
      // scanner reads 1-byte samples only, so route such files to the
      // zeros path rather than emit wrong features
      require(w > 0 && h > 0 && maxval > 0 && maxval <= 255)
      // size math in Long: a malformed header like "P6 50000 50000" would
      // overflow 3*w*h in Int, slip past the bound check, and emit garbage
      // instead of the documented zeros
      require(3L * w * h <= bytes.length.toLong - pos)
      val sums = new Array[Long](3)
      var i = 0
      val n = w * h
      while (i < n) {
        sums(0) += bytes(pos + 3 * i) & 0xff
        sums(1) += bytes(pos + 3 * i + 1) & 0xff
        sums(2) += bytes(pos + 3 * i + 2) & 0xff
        i += 1
      }
      Array(w.toFloat, h.toFloat, maxval.toFloat,
        (sums(0).toDouble / n / maxval).toFloat,
        (sums(1).toDouble / n / maxval).toFloat,
        (sums(2).toDouble / n / maxval).toFloat,
        n.toFloat, w.toFloat / h.toFloat)
    } catch {
      case _: Throwable => new Array[Float](featureDim)
    }
  }
}

/** Full image decode via the JDK's own `javax.imageio` — PNG, JPEG, BMP,
  * GIF and WBMP with zero added dependencies. Features (same 8-wide layout
  * as [[PpmFeaturizer]]): width, height, color-component count, mean
  * R/G/B in [0, 1], pixel count, aspect ratio. Undecodable or malformed
  * payloads featurize to zeros (`ImageIO.read` returns null on unknown
  * formats; corrupt media must not kill a 100 TB scan).
  *
  * Decode cost dominates the row, so the mapPartitions plan is identical
  * to the other codecs — partition-parallel, no shuffle, no driver
  * involvement. `ImageIO` caches to disk by default for large streams;
  * disabled here (pure in-memory decode) so executors never touch local
  * tmp for scratch files. */
object ImageIoFeaturizer extends Featurizer {
  javax.imageio.ImageIO.setUseCache(false)
  val featureDim = 8
  def featurize(bytes: Array[Byte]): Array[Float] = {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null && img.getWidth > 0 && img.getHeight > 0)
      val w = img.getWidth; val h = img.getHeight
      val channels = img.getColorModel.getNumComponents
      val sums = new Array[Long](3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y) // sRGB regardless of source model
          sums(0) += (rgb >> 16) & 0xff
          sums(1) += (rgb >> 8) & 0xff
          sums(2) += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(w.toFloat, h.toFloat, channels.toFloat,
        (sums(0).toDouble / n / 255.0).toFloat,
        (sums(1).toDouble / n / 255.0).toFloat,
        (sums(2).toDouble / n / 255.0).toFloat,
        n.toFloat, w.toFloat / h.toFloat)
    } catch {
      case _: Throwable => new Array[Float](featureDim)
    }
  }
}

/** Multimodal-column plumbing for training-data pipelines (builder north
  * star): media payloads travel as opaque BINARY columns with typed
  * metadata; decode/feature-extract runs as per-partition imperative code —
  * the one place `mapPartitions` is the right tool (native codec calls
  * cannot be expressed as Catalyst expressions).
  *
  * The decoder is PLUGGABLE via [[Featurizer]]: [[ImageIoFeaturizer]]
  * decodes the formats a training pipeline actually sees (PNG/JPEG/BMP/
  * GIF, via the JDK's javax.imageio — no external codecs needed);
  * [[PpmFeaturizer]] is a self-contained header-parsing decoder;
  * [[Md5Featurizer]] is the deterministic stand-in for container formats
  * without JDK codecs (audio/video) and stays the DEFAULT so the oracle
  * query remains SQL-replicable. The Spark side — binary schema,
  * partition-parallel batched execution, typed output Encoder, downstream
  * compatibility with similarity/dedup operators — is identical for every
  * implementation.
  */
object Multimodal {

  val FeatureDim: Int = Md5Featurizer.featureDim

  /** Back-compat alias for the default stub featurizer. */
  def featurize(bytes: Array[Byte]): Array[Float] =
    Md5Featurizer.featurize(bytes)

  /** Decode + featurize a media table (media_id LONG, kind STRING,
    * payload BINARY) with the given codec. Runs partition-parallel with no
    * shuffle; only the needed columns are scanned. */
  def decodeAndFeaturize(media: DataFrame,
                         codec: Featurizer = Md5Featurizer)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        MediaFeatures(id, kind, payload.length.toLong,
          codec.featurize(payload))
      })
  }

  /** Frame-sampling plumbing for video-like payloads: emit one row per
    * sampled frame index (every `stride` bytes as a stand-in for frame
    * boundaries). Demonstrates the explode-shaped decode path (1 input row
    * -> N frame rows) for containers without a parser; for AVI payloads
    * [[Video.frameHashes]] samples at REAL frame boundaries. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0),
        greatest(floor((length(col("payload")) - lit(1))
          / lit(stride.toDouble)).cast("int"), lit(0))))
        .as("frame_idx"))

  /** Decode a payload to an integer-luma pixel grid: (w, h, luma) with
    * luma(y·w + x) = 299·R + 587·G + 114·B (the Rec.601 weights scaled
    * ×1000 — INTEGER, so every downstream comparison is exact and
    * engine-replayable). Tries the JDK's javax.imageio first (PNG/JPEG/
    * BMP/GIF), then binary PPM (P6, 1-byte samples); None for anything
    * undecodable — corrupt media must not kill a scan. */
  private[graft] def decodeLumaGrid(bytes: Array[Byte])
      : Option[(Int, Int, Array[Long])] = {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img != null && img.getWidth > 0 && img.getHeight > 0) {
        val w = img.getWidth; val h = img.getHeight
        val luma = new Array[Long](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            luma(y * w + x) = 299L * ((rgb >> 16) & 0xff) +
              587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        return Some((w, h, luma))
      }
    } catch { case _: Throwable => () }
    try { // PPM P6 fallback (the PpmFeaturizer header grammar)
      require(bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6')
      var pos = 2
      def nextInt(): Int = {
        while (pos < bytes.length &&
          (bytes(pos).toChar.isWhitespace ||
            bytes(pos) == '#' && {
              while (pos < bytes.length && bytes(pos) != '\n') pos += 1
              true
            })) pos += 1
        var v = 0
        while (pos < bytes.length && bytes(pos).toChar.isDigit) {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      pos += 1
      require(w > 0 && h > 0 && maxval > 0 && maxval <= 255)
      require(3L * w * h <= bytes.length.toLong - pos)
      val luma = new Array[Long](w * h)
      var i = 0
      while (i < w * h) {
        luma(i) = 299L * (bytes(pos + 3 * i) & 0xff) +
          587L * (bytes(pos + 3 * i + 1) & 0xff) +
          114L * (bytes(pos + 3 * i + 2) & 0xff)
        i += 1
      }
      Some((w, h, luma))
    } catch { case _: Throwable => None }
  }

  /** 56-bit perceptual dHash (difference hash): decode to the luma grid,
    * pool into an 8×8 cell grid, set bit ky·7+kx iff the mean luma of
    * cell (kx+1, ky) exceeds cell (kx, ky) — 7 column-adjacent
    * comparisons × 8 rows = 56 bits, the engine's [[Dedup.SimhashBits]]
    * fingerprint width (BIGINT-safe for oracle replay). Pixel x belongs
    * to cell ⌊x·8/w⌋ (exact integer binning; cells may differ in pixel
    * count for w,h not divisible by 8, so means compare CROSS-MULTIPLIED
    * — sum_a·n_b > sum_b·n_a — never through doubles). Robust to
    * uniform brightness shifts and to small perturbations: e flipped
    * pixels move ≤ e cell comparisons, so near-identical images land
    * within small Hamming distance — exactly the banded
    * [[Dedup]] pigeonhole-pair machinery's input contract.
    * Returns null (never a sentinel hash) for undecodable payloads. */
  def dHash56(bytes: Array[Byte]): java.lang.Long =
    decodeLumaGrid(bytes) match {
      case None => null
      case Some((w, h, luma)) => dHashOfGrid(w, h, luma)
    }

  /** The pooling + comparison half of [[dHash56]], shared with decoders
    * that produce luma grids directly (video frames, [[Video]]). */
  private[graft] def dHashOfGrid(w: Int, h: Int, luma: Array[Long]): Long = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val ky = y * 8 / h
      var x = 0
      while (x < w) {
        val kx = x * 8 / w
        sums(ky * 8 + kx) += luma(y * w + x)
        counts(ky * 8 + kx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var ky = 0
    while (ky < 8) {
      var kx = 0
      while (kx < 7) {
        val a = ky * 8 + kx
        val b = a + 1
        // mean_b > mean_a, exact: sums fit 1000·255·(w·h) << 2^63
        if (sums(b) * counts(a) > sums(a) * counts(b))
          hash |= 1L << (ky * 7 + kx)
        kx += 1
      }
      ky += 1
    }
    hash
  }

  /** Integer area-average resize of decoded payloads to an outW×outH
    * luma grid — the explicit "resize" verb of the multimodal pipeline
    * (decode / feature-extract / RESIZE / frame-sample). Input pixel x
    * joins output cell ⌊x·outW/w⌋ (the same exact binning the dHash
    * pooling uses, so cells may differ in pixel count for sizes not
    * divisible by the target); each cell reports ⌊Σ luma / count⌋ in the
    * ×1000 Rec.601 luma scale — all-integer arithmetic, so an external
    * engine replays every output value exactly (q77). One row per
    * (payload, output cell); undecodable payloads drop (corrupt media
    * must not kill a scan). Partition-parallel decode, no shuffle. */
  def resizedLuma(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1,
      s"resize target must be positive, got ${outW}x$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeLumaGrid(payload).toSeq.flatMap { case (w, h, luma) =>
          val sums = new Array[Long](outH * outW)
          val counts = new Array[Long](outH * outW)
          var y = 0
          while (y < h) {
            val ky = y * outH / h
            var x = 0
            while (x < w) {
              val kx = x * outW / w
              sums(ky * outW + kx) += luma(y * w + x)
              counts(ky * outW + kx) += 1
              x += 1
            }
            y += 1
          }
          // only covered cells: upscaling past the source resolution
          // leaves gaps (⌊x·outW/w⌋ skips cells when outW > w), and an
          // uncovered cell has no defined mean
          (0 until outH * outW).collect {
            case c if counts(c) > 0 =>
              (id, c / outW, c % outW, sums(c) / counts(c))
          }
        }
      })
      .toDF("media_id", "ky", "kx", "v")
  }

  /** [[resizedLuma]] emitting the whole target grid as ONE row per image
    * (row-major ky·outW + kx; −1 marks cells upscaling left uncovered —
    * means are always non-negative, so the sentinel is unambiguous).
    * This is the bulk-pipeline shape: map-only end to end — no per-cell
    * row fan-out, no exchange at all — where [[resizedLuma]]'s 64
    * rows/image exist to be cell-addressable (and to feed the per-cell
    * oracle). Identical arithmetic; a pivot of one is the other. */
  def resizedLumaGrid(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1,
      s"resize target must be positive, got ${outW}x$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        decodeLumaGrid(payload).map { case (w, h, luma) =>
          val sums = new Array[Long](outH * outW)
          val counts = new Array[Long](outH * outW)
          var y = 0
          while (y < h) {
            val ky = y * outH / h
            var x = 0
            while (x < w) {
              val kx = x * outW / w
              sums(ky * outW + kx) += luma(y * w + x)
              counts(ky * outW + kx) += 1
              x += 1
            }
            y += 1
          }
          (id, Array.tabulate(outH * outW)(c =>
            if (counts(c) > 0) sums(c) / counts(c) else -1L).toSeq)
        }
      })
      .toDF("media_id", "grid")
  }

  /** Bulk perceptual hashing: (media_id, payload) -> (_id, simhash), one
    * decode per row at the codec boundary (mapPartitions — the justified
    * imperative island, same plan shape as [[decodeAndFeaturize]]);
    * undecodable payloads drop out. The output column names feed
    * straight into [[Dedup]]'s banded Hamming pair machinery. */
  def dHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Option(dHash56(payload)).map(h => (id, h.longValue()))
      })
      .toDF("_id", "simhash")
  }
}
