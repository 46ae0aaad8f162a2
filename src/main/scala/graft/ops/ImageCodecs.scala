package graft.ops

/** Real decoders for the two classic uncompressed image formats — binary
  * PPM (P6) and 24-bit uncompressed BMP — implemented from the public
  * format specs with zero codec dependencies (this container ships none).
  *
  * These give [[Multimodal.decodeFeatures]] a genuine decode step: payloads
  * carrying either magic are parsed header+pixels into packed RGB and
  * feature-extracted for real; other byte streams fall back to the
  * deterministic pseudo-features. JPEG/PNG/audio stay out of scope — they
  * need entropy coders that would be re-implementation for its own sake;
  * at deployment those arrive via JNI/FFI behind the same signature.
  */
object ImageCodecs {

  /** Packed RGB (3 bytes/pixel, row-major, top-down). */
  final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

  /** Hard ceiling on accepted pixel counts: a corrupt/hostile header must
    * yield None, never an allocation failure that kills the task (and with
    * it the whole job at 100 TB). 64M pixels = 192 MB RGB, far above any
    * legitimate payload here. */
  private val MaxPixels = 64L * 1024 * 1024

  /** Magic-dispatched decode; None = not a supported image format OR a
    * malformed/corrupt payload of a supported one — decode never throws. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else None

  /** Binary PPM: `P6 <w> <h> <maxval>` as whitespace-separated ASCII
    * tokens (with `#` comments), ONE whitespace byte, then w*h*3 raw RGB
    * bytes. Only maxval 255 (the 1-byte-per-sample case) is supported. */
  def decodePpm(bytes: Array[Byte]): Option[DecodedImage] =
    decodePpmAt(bytes, 0).map(_._1)

  /** One P6 frame starting at `start` plus the offset just past its
    * raster — the building block [[VideoCodecs.decodeClip]] walks a
    * concatenated-PPM stream with. Never throws. */
  private[ops] def decodePpmAt(bytes: Array[Byte], start: Int): Option[(DecodedImage, Int)] = {
    if (bytes == null || start < 0 || start + 2 > bytes.length ||
      bytes(start) != 'P' || bytes(start + 1) != '6') return None
    var pos = start + 2
    def nextInt(): Option[Int] = {
      while (pos < bytes.length &&
        (Character.isWhitespace(bytes(pos).toChar) || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < bytes.length && !Character.isWhitespace(bytes(pos).toChar)) pos += 1
      if (start == pos) None
      else try Some(new String(bytes, start, pos - start, "US-ASCII").toInt)
      catch { case _: NumberFormatException => None }
    }
    for {
      w <- nextInt()
      h <- nextInt()
      maxv <- nextInt()
      // single whitespace separator before the raster — but tolerate the
      // common out-of-spec CRLF writers ('\r\n' counts as one separator,
      // else the raster silently shifts by one byte)
      data = if (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n')
        pos + 2 else pos + 1
      if w > 0 && h > 0 && maxv == 255 &&
        w.toLong * h <= MaxPixels &&
        bytes.length - data >= w.toLong * h * 3
    } yield (DecodedImage(w, h,
      java.util.Arrays.copyOfRange(bytes, data, data + w * h * 3)),
      data + w * h * 3)
  }

  /** 24-bit uncompressed BMP (BITMAPINFOHEADER or longer): BGR samples,
    * rows padded to 4 bytes, bottom-up unless height is negative. */
  def decodeBmp(bytes: Array[Byte]): Option[DecodedImage] = {
    def i32(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8) |
      ((bytes(o + 2) & 0xFF) << 16) | ((bytes(o + 3) & 0xFF) << 24)
    def i16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    if (bytes.length < 54) return None
    val dataOffset = i32(10)
    val hdrSize = i32(14)
    val w = i32(18)
    val hRaw = i32(22)
    if (hdrSize < 40 || i16(26) != 1 || i16(28) != 24 || i32(30) != 0 ||
      w <= 0 || hRaw == 0 || hRaw == Int.MinValue) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    // all size math in Long: a crafted width must fail the guards, not
    // overflow Int into a negative allocation size
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4
    if (w.toLong * h > MaxPixels) return None
    if (dataOffset < 54 || bytes.length < dataOffset + rowSizeL * h) return None
    val rowSize = rowSizeL.toInt
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val src = dataOffset + srcRow * rowSize
      var x = 0
      while (x < w) {
        rgb((y * w + x) * 3) = bytes(src + x * 3 + 2) // BMP stores BGR
        rgb((y * w + x) * 3 + 1) = bytes(src + x * 3 + 1)
        rgb((y * w + x) * 3 + 2) = bytes(src + x * 3)
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(w, h, rgb))
  }

  /** Nearest-neighbor downscale by an integer factor: output pixel (x, y)
    * copies source pixel (x·factor, y·factor) — pure integer index math,
    * so any engine (or a SQL oracle) re-derives identical pixels. Output
    * dims are `max(1, dim / factor)`; `x·factor ≤ w − factor < w` keeps
    * every source index in range, and images smaller than the factor
    * collapse to their top-left pixel. */
  def resizeNearest(img: DecodedImage, factor: Int): DecodedImage = {
    require(factor >= 1, "factor must be >= 1")
    if (factor == 1) return img
    val nw = math.max(1, img.width / factor)
    val nh = math.max(1, img.height / factor)
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      var x = 0
      while (x < nw) {
        val si = ((y * factor) * img.width + (x * factor)) * 3
        val di = (y * nw + x) * 3
        out(di) = img.rgb(si)
        out(di + 1) = img.rgb(si + 1)
        out(di + 2) = img.rgb(si + 2)
        x += 1
      }
      y += 1
    }
    DecodedImage(nw, nh, out)
  }

  /** Perceptual average-hash over the decoded pixels, INTEGER-EXACT so
    * any engine replays it bit-for-bit (no float luma, no mean division):
    *
    *  - cell (cx, cy) of the `grid`×`grid` sampling reads source pixel
    *    `(cx·w / grid, cy·h / grid)` (integer division — the
    *    [[resizeNearest]] index convention);
    *  - cell luminance = r + g + b (0..765, exact);
    *  - bit b = cy·grid + cx is set iff `lum_b · grid² > Σ lums`
    *    (cross-multiplied mean comparison — division-free, exact);
    *  - returned as two non-negative 32-bit halves (hi = bits 32..63,
    *    lo = bits 0..31) so SQL oracles avoid 64-bit sign pitfalls.
    *
    * Near-identical images differ in few bits; Hamming distance over the
    * halves drives [[graft.ops.Dedup.imageNearDupPairs]]. */
  def averageHashHalves(img: DecodedImage, grid: Int = 8): (Long, Long) = {
    require(grid >= 1 && grid * grid <= 64, "grid² must fit in 64 bits")
    val cells = new Array[Long](grid * grid)
    var total = 0L
    var cy = 0
    while (cy < grid) {
      var cx = 0
      while (cx < grid) {
        val sx = cx * img.width / grid
        val sy = cy * img.height / grid
        val si = (sy * img.width + sx) * 3
        val lum = (img.rgb(si) & 0xFF) + (img.rgb(si + 1) & 0xFF) +
          (img.rgb(si + 2) & 0xFF)
        cells(cy * grid + cx) = lum.toLong
        total += lum
        cx += 1
      }
      cy += 1
    }
    val n = grid * grid
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < n) {
      if (cells(b) * n > total) {
        if (b < 32) lo |= 1L << b
        else hi |= 1L << (b - 32)
      }
      b += 1
    }
    (hi, lo)
  }

  /** 256-bit perceptual GRADIENT hash (dHash) over the decoded pixels,
    * INTEGER-EXACT like [[averageHashHalves]]:
    *
    *  - 16 sample rows × 17 sample columns: point (cx, cy) reads source
    *    pixel `(cx·w / 17, cy·h / 16)` (integer division, the
    *    [[resizeNearest]] index convention); luminance = r + g + b;
    *  - bit `cy·16 + cx` (cx in 0..15) is set iff
    *    `lum(cx+1, cy) > lum(cx, cy)` — the horizontal gradient sign;
    *  - returned as EIGHT non-negative 32-bit words (word j = bits
    *    32j..32j+31), long-typed so SQL oracles never touch the 64-bit
    *    sign bit (DuckDB raises on `1::BIGINT << 63`).
    *
    * Why 256 bits when [[averageHashHalves]] is 64: Hamming banding over
    * a 64-bit hash pigeonholes exact-recall-≤3 into four 16-bit bands —
    * a 65,536-key space whose per-bucket occupancy grows linearly with
    * distinct-image count (the corpus ceiling). 256 bits support
    * 32-bit bands (keyspace 2³²) at the same relative radius — see
    * [[graft.ops.Dedup.imageNearDupPairs256]]. */
  def gradientHashWords(img: DecodedImage): Array[Long] = {
    val words = new Array[Long](8)
    var cy = 0
    while (cy < 16) {
      val sy = cy * img.height / 16
      var prev = 0
      var cx = 0
      while (cx <= 16) {
        val sx = cx * img.width / 17
        val si = (sy * img.width + sx) * 3
        val lum = (img.rgb(si) & 0xFF) + (img.rgb(si + 1) & 0xFF) +
          (img.rgb(si + 2) & 0xFF)
        if (cx > 0 && lum > prev) {
          val idx = cy * 16 + (cx - 1)
          words(idx / 32) |= 1L << (idx % 32)
        }
        prev = lum
        cx += 1
      }
      cy += 1
    }
    words
  }

  /** PPM encoder (for tests and round-trip plumbing). */
  def encodePpm(img: DecodedImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Deterministic image features, format-agnostic (the same image encoded
    * as PPM or BMP yields identical features): `[width, height, meanR,
    * meanG, meanB, luminance histogram over the remaining bins]`, channel
    * means and histogram mass normalized to [0, 1]. */
  def imageFeatures(img: DecodedImage, featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    val n = img.width.toLong * img.height
    if (featureDim > 0) out(0) = img.width.toFloat
    if (featureDim > 1) out(1) = img.height.toFloat
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < n) {
      r += img.rgb(3 * i) & 0xFF
      g += img.rgb(3 * i + 1) & 0xFF
      b += img.rgb(3 * i + 2) & 0xFF
      i += 1
    }
    if (featureDim > 2) out(2) = (r.toDouble / n / 255.0).toFloat
    if (featureDim > 3) out(3) = (g.toDouble / n / 255.0).toFloat
    if (featureDim > 4) out(4) = (b.toDouble / n / 255.0).toFloat
    val bins = featureDim - 5
    if (bins > 0) {
      val inc = (1.0 / n).toFloat
      var j = 0
      while (j < n) {
        // integer ITU-R 601 luma, exact and portable
        val lum = ((img.rgb(3 * j) & 0xFF) * 299 + (img.rgb(3 * j + 1) & 0xFF) * 587 +
          (img.rgb(3 * j + 2) & 0xFF) * 114) / 1000
        out(5 + lum * bins / 256) += inc
        j += 1
      }
    }
    out
  }
}
