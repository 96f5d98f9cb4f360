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
