package graft.llm

/** Pure-Scala header parsers for the two compressed-media families the JDK
  * ships no codec for: MPEG audio (mp3) and ISO-BMFF (mp4/mov). FRAME DATA
  * for these formats still cannot be decoded without native libraries —
  * that boundary stands, clearly labeled in Multimodal — but container
  * METADATA (dimensions, frame counts, channel layout) is plain structured
  * bytes, so feature extraction over them can be honest instead of stubbed:
  * everything returned here is read from the real container structure.
  *
  * Both parsers are executor-side pure functions over byte arrays (the
  * mapPartitions hot-loop shape): no allocation beyond the walk, no I/O.
  */
object MediaHeaders {

  // --- MPEG audio (mp3) ---------------------------------------------------

  // MPEG-1 Layer III bitrates (kbps) and sample rates (Hz), indexed by the
  // 4-bit / 2-bit header fields (index 0 = "free", 15 = invalid).
  private val Mp3Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3SampleRates = Array(44100, 48000, 32000)

  /** Full header metadata of an MPEG-1 Layer III frame chain. Each frame
    * carries 1152 samples, so `durationMs` = frames * 1152 / sampleRate —
    * honest container arithmetic, no payload decode.
    */
  final case class Mp3Info(frames: Int, channels: Int, sampleRate: Int) {
    def durationMs: Double = frames * 1152.0 * 1000.0 / sampleRate
  }

  /** MPEG-1 Layer III frame-chain walk: sync word, bitrate/samplerate
    * indices, padding bit -> frame length (144 * bitrate / samplerate +
    * padding), repeat. An ID3v2 tag (header + syncsafe length) is skipped
    * first. At least two consecutive valid frames are required before
    * claiming mp3 — a lone 0xFFE sync is too easy to find in arbitrary
    * binary.
    */
  def sniffMp3Info(bytes: Array[Byte]): Option[Mp3Info] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    var p = 0
    // ID3v2: "ID3" + version(2) + flags(1) + 28-bit syncsafe size
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
      p = 10 + size
    }
    var frames = 0
    var channels = 0
    var sampleRate = 0
    var ok = true
    while (ok && p + 4 <= bytes.length) {
      val b1 = u8(p); val b2 = u8(p + 1); val b3 = u8(p + 2); val b4 = u8(p + 3)
      // sync (11 bits) + MPEG-1 (version bits 11) + Layer III (bits 01)
      if (b1 != 0xff || (b2 & 0xfe) != 0xfa) ok = false
      else {
        val bitrateIdx = (b3 >> 4) & 0x0f
        val srIdx = (b3 >> 2) & 0x03
        if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3) ok = false
        else {
          val padding = (b3 >> 1) & 1
          val len = 144 * Mp3Bitrates(bitrateIdx) * 1000 /
            Mp3SampleRates(srIdx) + padding
          channels = if (((b4 >> 6) & 0x03) == 3) 1 else 2
          sampleRate = Mp3SampleRates(srIdx)
          frames += 1
          p += len
        }
      }
    }
    // the chain must cover the payload (trailing partial frame tolerated)
    if (frames >= 2 && p >= bytes.length)
      Some(Mp3Info(frames, channels, sampleRate))
    else None
  }

  /** (format, frames, channels) view of sniffMp3Info — the decodeAny
    * fallback-chain shape shared with the other sniffers.
    */
  def sniffMp3(bytes: Array[Byte]): Option[(String, Int, Int)] =
    sniffMp3Info(bytes).map(i => ("audio/mpeg", i.frames, i.channels))

  /** Structurally-valid MPEG-1 Layer III silence stream (128 kbps, 44.1 kHz):
    * real frame headers + zeroed payloads, optional ID3v2 tag. Used to
    * exercise the parser and the media table's mp3-family rows — the header
    * chain is real; the audio payload is silence-shaped filler.
    */
  def encodeMp3Silence(nFrames: Int, mono: Boolean = true,
                       id3Padding: Int = 0): Array[Byte] = {
    val frameLen = 144 * 128000 / 44100 // 417, padding bit 0
    val out = new java.io.ByteArrayOutputStream()
    if (id3Padding > 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write(Array[Byte](((id3Padding >> 21) & 0x7f).toByte,
        ((id3Padding >> 14) & 0x7f).toByte, ((id3Padding >> 7) & 0x7f).toByte,
        (id3Padding & 0x7f).toByte))
      out.write(new Array[Byte](id3Padding))
    }
    val header = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte,
      if (mono) 0xc0.toByte else 0x00.toByte)
    (0 until nFrames).foreach { _ =>
      out.write(header)
      out.write(new Array[Byte](frameLen - 4))
    }
    out.toByteArray
  }

  // --- ISO-BMFF (mp4/mov) -------------------------------------------------

  private val Mp4Containers =
    Set("moov", "trak", "mdia", "minf", "stbl", "edts")

  /** Track dimensions from the real ISO-BMFF box tree: walk top-level boxes
    * (32-bit size + fourcc, 64-bit `largesize` and size==0 supported),
    * recurse into container boxes, read width/height from the first `tkhd`
    * with nonzero dimensions (16.16 fixed point, version 0 and 1 layouts).
    * Requires a leading `ftyp` to claim the format.
    */
  def sniffMp4(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def fourcc(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 12 || fourcc(4) != "ftyp") return None
    var dims: Option[(Int, Int)] = None
    def walk(from: Long, to: Long): Unit = {
      var p = from
      while (p + 8 <= to && dims.isEmpty) {
        val size0 = u32(p.toInt)
        val typ = fourcc(p.toInt + 4)
        val (bodyStart, boxEnd) =
          if (size0 == 1) { // 64-bit largesize
            val large = (u32(p.toInt + 8) << 32) | u32(p.toInt + 12)
            (p + 16, p + large)
          } else if (size0 == 0) (p + 8, to) // box runs to end of enclosure
          else (p + 8, p + size0)
        if (boxEnd <= p || boxEnd > to) return // malformed: stop
        if (Mp4Containers(typ)) walk(bodyStart, boxEnd)
        else if (typ == "tkhd" && boxEnd - bodyStart >= 4) {
          val version = bytes(bodyStart.toInt) & 0xff
          val whOff = bodyStart + 4 + (if (version == 1) 84 else 72)
          if (whOff + 8 <= boxEnd) {
            val w = (u32(whOff.toInt) >> 16).toInt
            val h = (u32(whOff.toInt + 4) >> 16).toInt
            if (w > 0 && h > 0) dims = Some((w, h))
          }
        }
        p = boxEnd
      }
    }
    try walk(0, bytes.length.toLong)
    catch { case _: ArrayIndexOutOfBoundsException => return None }
    dims.map { case (w, h) => ("video/mp4", w, h) }
  }

  /** Presentation duration in milliseconds from the real `mvhd` box
    * (moov/mvhd: 32-bit timescale + 32-bit (v0) or 64-bit (v1) duration —
    * duration/timescale seconds): the movie-level duration every ISO-BMFF
    * player shows, read from container structure alone. None when the box
    * tree is absent/malformed or the timescale is zero.
    */
  def mp4DurationMs(bytes: Array[Byte]): Option[Long] = {
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def fourcc(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 12 || fourcc(4) != "ftyp") return None
    var out: Option[Long] = None
    def walk(from: Long, to: Long): Unit = {
      var p = from
      while (p + 8 <= to && out.isEmpty) {
        val size0 = u32(p.toInt)
        val typ = fourcc(p.toInt + 4)
        val (bodyStart, boxEnd) =
          if (size0 == 1) {
            val large = (u32(p.toInt + 8) << 32) | u32(p.toInt + 12)
            (p + 16, p + large)
          } else if (size0 == 0) (p + 8, to)
          else (p + 8, p + size0)
        if (boxEnd <= p || boxEnd > to) return
        if (typ == "moov") walk(bodyStart, boxEnd)
        else if (typ == "mvhd" && boxEnd - bodyStart >= 4) {
          val version = bytes(bodyStart.toInt) & 0xff
          // v0: flags(3) creation(4) modification(4) timescale(4) dur(4)
          // v1: flags(3) creation(8) modification(8) timescale(4) dur(8)
          val tsOff = bodyStart + 4 + (if (version == 1) 16 else 8)
          val durLen = if (version == 1) 8 else 4
          if (tsOff + 4 + durLen <= boxEnd) {
            val timescale = u32(tsOff.toInt)
            val duration =
              if (version == 1)
                (u32(tsOff.toInt + 4) << 32) | u32(tsOff.toInt + 8)
              else u32(tsOff.toInt + 4)
            if (timescale > 0) out = Some(duration * 1000L / timescale)
          }
        }
        p = boxEnd
      }
    }
    try walk(0, bytes.length.toLong)
    catch { case _: ArrayIndexOutOfBoundsException => return None }
    out
  }

  /** Minimal well-formed ISO-BMFF shell (ftyp + moov[mvhd, trak[tkhd]] +
    * mdat): every box has a correct size, the tkhd carries real 16.16
    * dimensions and a unity matrix, and the mvhd carries the given
    * timescale/duration. The mdat payload is opaque filler — this
    * synthesizes the CONTAINER (what sniffMp4 parses), not codec data.
    */
  def encodeMp4Shell(width: Int, height: Int,
                     mdat: Array[Byte] = new Array[Byte](16),
                     timescale: Long = 1000L,
                     duration: Long = 1000L): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0) ++ "isom".getBytes)
    // mvhd v0: flags, creation, modification, timescale, duration, rate,
    // volume+reserved, reserved, unity matrix, predefined, next track id
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++
      be32(duration) ++ be32(0x00010000L) ++ be32(0x01000000L) ++
      new Array[Byte](8) ++
      (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(0x40000000L)) ++ new Array[Byte](24) ++ be32(2))
    // tkhd v0: flags(enabled), creation, modification, track, reserved,
    // duration, reserved x2, layer/group/volume/reserved, matrix, w, h
    val tkhd = box("tkhd", be32(7) ++ be32(0) ++ be32(0) ++ be32(1) ++
      be32(0) ++ be32(1000) ++ new Array[Byte](8) ++ new Array[Byte](8) ++
      (be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++
        be32(0x40000000L)) ++
      be32(width.toLong << 16) ++ be32(height.toLong << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov ++ box("mdat", mdat)
  }
}
