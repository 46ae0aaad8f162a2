package graft.ops

/** Real decoder for the classic uncompressed video interchange — a
  * concatenated stream of binary PPM (P6) frames, the raw format pipe
  * tools emit for codec-free frame exchange — built on
  * [[ImageCodecs.decodePpmAt]] with zero codec dependencies (the video
  * sibling of [[AudioCodecs]]). Compressed containers (H.264/VP9/AV1)
  * need entropy coders and arrive via JNI/FFI behind the same signature
  * in deployment.
  */
object VideoCodecs {

  /** Frame-count ceiling: a hostile stream of 1×1 frames must exhaust
    * this, not the task heap. 4096 frames ≈ 2+ minutes at 30 fps. */
  private val MaxFrames = 4096

  /** Decode a concatenated-PPM clip into its frames.
    *
    * Frames parse sequentially; the walk stops at the first byte that
    * does not begin a well-formed frame, so a TRUNCATED tail (the common
    * crawl corruption — the audio decoder's partial-frame tolerance)
    * yields the whole frames before it. None when no whole frame decodes
    * (not a clip at all) or the frame-count ceiling is hit (hostile
    * stream, refuse rather than truncate silently at a round number).
    * Never throws. */
  def decodeClip(bytes: Array[Byte]): Option[Seq[ImageCodecs.DecodedImage]] = {
    if (bytes == null || bytes.length < 2) return None
    val frames = Seq.newBuilder[ImageCodecs.DecodedImage]
    var n = 0
    var pos = 0
    var done = false
    while (!done) {
      ImageCodecs.decodePpmAt(bytes, pos) match {
        case Some((img, next)) =>
          if (n >= MaxFrames) return None
          frames += img
          n += 1
          pos = next
        case None => done = true
      }
    }
    if (n == 0) None else Some(frames.result())
  }

  /** Clip encoder (tests and payload-synthesis plumbing): frames
    * back-to-back, each a standard P6. */
  def encodeClip(frames: Seq[ImageCodecs.DecodedImage]): Array[Byte] =
    frames.toArray.flatMap(ImageCodecs.encodePpm)
}
