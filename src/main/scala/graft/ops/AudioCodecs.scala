package graft.ops

/** Real decoder for the classic uncompressed audio container — RIFF/WAVE
  * with integer PCM samples — implemented from the public format spec with
  * zero codec dependencies (the audio sibling of [[ImageCodecs]]).
  * Compressed formats (MP3/AAC/Opus) need entropy coders and arrive via
  * JNI/FFI behind the same signature in deployment.
  */
object AudioCodecs {

  /** Parsed WAV facts + a real signal feature (RMS of normalized samples). */
  final case class WavMeta(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nFrames: Long,
      rms: Double)

  private val MaxDataBytes = 256L * 1024 * 1024 // corrupt-header allocation guard

  /** Validated PCM layout: (channels, rate, bits, data offset, data len).
    * The shared chunk walk behind [[decodeWav]] and
    * [[energyFingerprintHalves]]. */
  private def pcmLayout(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Long)] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long = (u16(o).toLong & 0xFFFF) | ((u16(o + 2).toLong & 0xFFFF) << 16)
    if (bytes == null || bytes.length < 44) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F' ||
      bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None

    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Long)] = None    // (offset, length)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = u32(pos + 4)
      if (size < 0 || size > MaxDataBytes || pos + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        if (u16(pos + 8) != 1) return None // PCM only
        fmt = Some((u16(pos + 10), u32(pos + 12).toInt, u16(pos + 22)))
      } else if (id == "data") {
        data = Some((pos + 8, size))
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    for {
      (channels, rate, bits) <- fmt
      (off, len) <- data
      if channels > 0 && rate > 0 && (bits == 8 || bits == 16)
    } yield (channels, rate, bits, off, len)
  }

  /** Decode a RIFF/WAVE payload: walks the chunk list (fmt may be
    * preceded/followed by LIST/fact/etc chunks), supports PCM (format 1)
    * with 8-bit unsigned or 16-bit signed little-endian samples.
    * None on anything malformed — never throws. */
  def decodeWav(bytes: Array[Byte]): Option[WavMeta] = {
    for {
      (channels, rate, bits, off, len) <- pcmLayout(bytes)
      bytesPerFrame = channels * (bits / 8)
      nFrames = len / bytesPerFrame
      if nFrames >= 0
    } yield {
      var sumSq = 0.0
      // Whole frames only: a truncated crawl can leave a partial trailing
      // frame in the data chunk; its orphan samples are not part of any frame.
      val nSamples = (nFrames * channels).toInt
      var i = 0
      while (i < nSamples) {
        val s =
          if (bits == 8) ((bytes(off + i) & 0xFF) - 128) / 128.0
          else {
            val lo = bytes(off + 2 * i) & 0xFF
            val hi = bytes(off + 2 * i + 1)
            ((hi << 8) | lo) / 32768.0
          }
        sumSq += s * s
        i += 1
      }
      val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
      WavMeta(rate, channels, bits, nFrames, rms)
    }
  }

  /** 64-bit perceptual ENERGY fingerprint of a PCM clip, INTEGER-EXACT
    * (the audio analogue of [[ImageCodecs.averageHashHalves]] /
    * `gradientHashWords`, chromaprint's shape without the FFT — float
    * spectra are not bit-portable across engines, integer energy sums
    * are):
    *
    *  - the clip divides into 65 windows by FRAME index: frame `f`
    *    belongs to window `f·65 / nFrames` (integer division — the
    *    resize/avg-hash index convention);
    *  - window energy `E_w` = Σ |sample| over every channel sample of
    *    its frames (integer magnitudes: 16-bit signed or 8-bit
    *    offset-128 — sums stay well under 2⁶³, exact);
    *  - bit `w` (0..63) is set iff `E_{w+1} > E_w` — the energy-gradient
    *    sign, loudness-scale-robust like dHash is brightness-robust;
    *  - returned as two non-negative 32-bit halves (lo = bits 0..31),
    *    the [[graft.ops.Dedup.audioNearDupPairs]] artifact.
    *
    * None for malformed payloads or zero-frame clips. */
  def energyFingerprintHalves(bytes: Array[Byte]): Option[(Long, Long)] =
    pcmLayout(bytes).flatMap { case (channels, _, bits, off, len) =>
      val bytesPerFrame = channels * (bits / 8)
      val nFrames = len / bytesPerFrame
      if (nFrames <= 0) None
      else {
        val energies = new Array[Long](65)
        // Whole frames only — counting a partial trailing frame's orphan
        // samples would index window frame*65/nFrames == 65, out of bounds.
        val nSamples = (nFrames * channels).toInt
        var i = 0
        while (i < nSamples) {
          val mag =
            if (bits == 8) math.abs((bytes(off + i) & 0xFF) - 128)
            else {
              val lo = bytes(off + 2 * i) & 0xFF
              val hi = bytes(off + 2 * i + 1)
              math.abs((hi << 8) | lo)
            }
          val frame = i / channels
          val w = ((frame * 65L) / nFrames).toInt
          energies(w) += mag
          i += 1
        }
        var hi = 0L
        var lo = 0L
        var w = 0
        while (w < 64) {
          if (energies(w + 1) > energies(w)) {
            if (w < 32) lo |= 1L << w
            else hi |= 1L << (w - 32)
          }
          w += 1
        }
        Some((hi, lo))
      }
    }

  /** WAV encoder (tests and payload-synthesis plumbing): 16-bit signed
    * little-endian PCM, standard 44-byte header. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(o: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, o)
    def put16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def put32(o: Int, v: Long): Unit = { put16(o, (v & 0xFFFF).toInt); put16(o + 2, ((v >> 16) & 0xFFFF).toInt) }
    putAscii(0, "RIFF"); put32(4, 36L + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16L); put16(20, 1); put16(22, channels)
    put32(24, sampleRate.toLong); put32(28, sampleRate.toLong * channels * 2)
    put16(32, channels * 2); put16(34, 16)
    putAscii(36, "data"); put32(40, dataLen.toLong)
    var i = 0
    while (i < samples.length) {
      put16(44 + 2 * i, samples(i) & 0xFFFF)
      i += 1
    }
    out
  }
}
