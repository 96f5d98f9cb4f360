package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL compressed-image codec on the pure-JDK `javax.imageio` stack —
  * PNG / JPEG / BMP / GIF / WBMP decode and PNG encode ship with the JVM,
  * no native libraries. This is the decoder the Multimodal stub used to
  * stand in for: raw GRIM/GRVD containers are still parsed by RawMedia,
  * compressed images land here, and only formats the JDK has no reader
  * for (compressed audio/video) fall through to the labeled stub.
  *
  * All entry points are executor-side pure functions over byte arrays —
  * the in-memory cache setting avoids ImageIO's default temp-file spill,
  * which would be a per-record disk write inside a mapPartitions hot loop.
  */
object CompressedMedia {

  ImageIO.setUseCache(false)

  /** Header-only probe: (format, width, height) without decoding pixels —
    * what feature extraction over a 100 TB media table should pay per row
    * (readers parse just the header for dimensions).
    */
  def sniff(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((s"image/${r.getFormatName.toLowerCase}",
            r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } catch {
      case _: Exception => None
    } finally iis.close()
  }

  /** Full decode to a 3-channel RGB RawMedia.Image (row-major RGB bytes),
    * so the downstream pixel math (resizeNearest etc.) is shared with the
    * raw-container path.
    */
  def decode(bytes: Array[Byte]): Option[RawMedia.Image] = {
    val bi =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (bi == null) None
    else {
      val (w, h) = (bi.getWidth, bi.getHeight)
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = bi.getRGB(x, y)
          val i = (y * w + x) * 3
          out(i) = ((rgb >> 16) & 0xff).toByte
          out(i + 1) = ((rgb >> 8) & 0xff).toByte
          out(i + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(RawMedia.Image(w, h, 3, out))
    }
  }

  /** Header-only audio probe on the pure-JDK `javax.sound.sampled` stack
    * (WAV/AIFF/AU ship with the JVM): (format, frame count, channels)
    * without decoding samples. Returns None for anything the JDK has no
    * audio reader for.
    */
  def sniffAudio(bytes: Array[Byte]): Option[(String, Int, Int)] =
    try {
      val f = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new ByteArrayInputStream(bytes))
      val fmt = f.getType.getExtension.toLowerCase
      Some((s"audio/$fmt", f.getFrameLength, f.getFormat.getChannels))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** Byte ranges of every frame in a GIF container, parsed from the GIF
    * block structure itself (pure Scala, header-only — no pixel decode):
    * header + logical screen descriptor (+ global color table), then a walk
    * over extension blocks (0x21) and image descriptors (0x2C). Each
    * returned (offset, length) spans one image descriptor through the end
    * of its LZW data sub-blocks — the real byte extent of that frame inside
    * the container, same contract as RawMedia.VideoInfo.frameOffset.
    * Returns None for non-GIF bytes or a malformed block structure.
    */
  def gifFrameRanges(bytes: Array[Byte]): Option[Vector[(Long, Int)]] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    if (bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    try {
      var p = 6 + 7 // header + logical screen descriptor
      val packed = u8(10)
      if ((packed & 0x80) != 0) p += 3 * (1 << ((packed & 0x07) + 1))
      val frames = Vector.newBuilder[(Long, Int)]
      def skipSubBlocks(): Unit = {
        while (u8(p) != 0) p += 1 + u8(p)
        p += 1 // block terminator
      }
      var done = false
      while (!done) {
        u8(p) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: introducer, label, sub-blocks
            p += 2
            skipSubBlocks()
          case 0x2c => // image descriptor
            val start = p
            val lpacked = u8(p + 9)
            p += 10
            if ((lpacked & 0x80) != 0) p += 3 * (1 << ((lpacked & 0x07) + 1))
            p += 1 // LZW minimum code size
            skipSubBlocks()
            frames += ((start.toLong, p - start))
          case _ => return None // unknown block: refuse rather than misparse
        }
      }
      Some(frames.result())
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Decode frame `i` of a multi-frame container (animated GIF is the one
    * the JDK can open) to a 3-channel RGB image. Frames with a smaller
    * rect than the logical screen come back at their own dimensions —
    * compositing/disposal is the caller's business.
    */
  def decodeFrame(bytes: Array[Byte], i: Int): Option[RawMedia.Image] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          if (i < 0 || i >= r.getNumImages(true)) None
          else Some(toRgb(r.read(i)))
        } finally r.dispose()
      }
    } catch {
      case _: Exception => None
    } finally iis.close()
  }

  /** Encode frames as a REAL animated GIF via the JDK's GIF ImageWriter
    * sequence API. GIF is palette-based (≤256 colors per frame); the writer
    * quantizes, so frames drawn from a small color set round-trip exactly.
    */
  def encodeGifAnimation(frames: Seq[RawMedia.Image]): Array[Byte] = {
    require(frames.nonEmpty, "encodeGifAnimation needs at least one frame")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(toBufferedImage(f), null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  private def toRgb(bi: BufferedImage): RawMedia.Image = {
    val (w, h) = (bi.getWidth, bi.getHeight)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = bi.getRGB(x, y)
        val i = (y * w + x) * 3
        out(i) = ((rgb >> 16) & 0xff).toByte
        out(i + 1) = ((rgb >> 8) & 0xff).toByte
        out(i + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    RawMedia.Image(w, h, 3, out)
  }

  private def toBufferedImage(img: RawMedia.Image): BufferedImage = {
    require(img.channels == 3, s"need 3 channels, got ${img.channels}")
    val bi = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val i = (y * img.width + x) * 3
        bi.setRGB(x, y, ((img.pixels(i) & 0xff) << 16) |
          ((img.pixels(i + 1) & 0xff) << 8) | (img.pixels(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    bi
  }

  final case class AudioStats(format: String, frames: Int, channels: Int,
                              sampleRate: Float, rms: Double, peak: Double)

  /** REAL PCM decode + signal stats for JDK-decodable audio (WAV/AIFF/AU):
    * normalizes samples to [-1, 1] across 8/16-bit, signed/unsigned,
    * little/big-endian PCM and returns RMS and absolute peak over all
    * channels. This is what makes audio features more than header metadata
    * — e.g. silence detection and loudness normalization in a training-data
    * audio filter. Returns None for formats the JDK cannot decode (mp3 &c).
    */
  def audioStats(bytes: Array[Byte]): Option[AudioStats] =
    try {
      import javax.sound.sampled._
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fileFmt = AudioSystem
          .getAudioFileFormat(new ByteArrayInputStream(bytes))
        val src = in.getFormat
        val samples = pcmSamples(in, src)
        var sumSq = 0.0
        var peak = 0.0
        samples.foreach { s =>
          sumSq += s * s
          val a = math.abs(s)
          if (a > peak) peak = a
        }
        val rms =
          if (samples.isEmpty) 0.0 else math.sqrt(sumSq / samples.length)
        Some(AudioStats(s"audio/${fileFmt.getType.getExtension.toLowerCase}",
          fileFmt.getFrameLength, src.getChannels, src.getSampleRate, rms,
          peak))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None // no conversion path
    }

  /** Decoded normalized samples ([-1, 1], channels interleaved) of any
    * JDK-supported audio container — the input to envelope hashing. None
    * for formats the JDK cannot decode. A magic-byte pre-check (RIFF /
    * FORM / .snd) rejects non-JDK containers BEFORE AudioSystem: letting
    * every mp3 row reject via UnsupportedAudioFileException costs an
    * exception per row, which dominated the audio-dedup scan when half
    * the corpus is mp3.
    */
  def decodeSamples(bytes: Array[Byte]): Option[Array[Double]] = {
    def magic(s: String) = bytes.length >= 4 &&
      bytes(0) == s(0).toByte && bytes(1) == s(1).toByte &&
      bytes(2) == s(2).toByte && bytes(3) == s(3).toByte
    if (!magic("RIFF") && !magic("FORM") && !magic(".snd")) return None
    try {
      import javax.sound.sampled._
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try Some(pcmSamples(in, in.getFormat)) finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None
    }
  }

  // Normalize every PCM flavor to signed 16-bit so the sample loop is one
  // code path; the JDK converts 8-bit unsigned etc. for free.
  private def pcmSamples(in: javax.sound.sampled.AudioInputStream,
                         src: javax.sound.sampled.AudioFormat): Array[Double] = {
    import javax.sound.sampled._
    val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      src.getSampleRate, 16, src.getChannels, 2 * src.getChannels,
      src.getSampleRate, false)
    val data = AudioSystem.getAudioInputStream(target, in).readAllBytes()
    val out = new Array[Double](data.length / 2)
    var i = 0
    while (i + 1 < data.length) {
      out(i / 2) = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort / 32768.0
      i += 2
    }
    out
  }

  /** Encode raw 8-bit PCM mono samples as a REAL RIFF/WAVE container. */
  def encodeWav(samples: Array[Byte], sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate, 8, 1, 1, sampleRate, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** PNG-encode a 3-channel image (PNG is lossless, so decode(encodePng(x))
    * round-trips pixels exactly — asserted in MultimodalSpec).
    */
  def encodePng(img: RawMedia.Image): Array[Byte] = {
    require(img.channels == 3, s"encodePng needs 3 channels, got ${img.channels}")
    val bi = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val i = (y * img.width + x) * 3
        val rgb = ((img.pixels(i) & 0xff) << 16) |
          ((img.pixels(i + 1) & 0xff) << 8) | (img.pixels(i + 2) & 0xff)
        bi.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(bi, "png", bos)
    bos.toByteArray
  }
}
