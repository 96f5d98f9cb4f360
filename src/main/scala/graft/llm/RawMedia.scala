package graft.llm

import java.nio.ByteBuffer

/** A minimal UNCOMPRESSED media container, implemented for real in pure
  * JVM — the part of a media pipeline that needs no native codec:
  *
  *   image  = "GRIM" | width:int32 | height:int32 | channels:uint8
  *            | pixels (width*height*channels bytes, row-major)
  *   video  = "GRVD" | nFrames:int32 | width:int32 | height:int32
  *            | channels:uint8 | frames (nFrames raw pixel planes)
  *
  * Header parsing, pixel addressing, nearest-neighbor resampling, and
  * frame extraction below are real implementations over this format;
  * only COMPRESSED formats (JPEG/H.264/...) fall back to the labeled stub
  * in Multimodal, since their codecs need native libraries this container
  * image does not ship.
  */
object RawMedia {

  private val ImageMagic = Array[Byte]('G', 'R', 'I', 'M')
  private val VideoMagic = Array[Byte]('G', 'R', 'V', 'D')
  private val ImageHeader = 13 // magic + w + h + channels
  private val VideoHeader = 17 // magic + nFrames + w + h + channels

  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])
  final case class VideoInfo(nFrames: Int, width: Int, height: Int,
                             channels: Int) {
    def frameBytes: Int = width * height * channels
    def frameOffset(i: Int): Long = VideoHeader.toLong + i.toLong * frameBytes
  }

  def encodeImage(img: Image): Array[Byte] = {
    require(img.pixels.length == img.width * img.height * img.channels)
    val buf = ByteBuffer.allocate(ImageHeader + img.pixels.length)
    buf.put(ImageMagic).putInt(img.width).putInt(img.height)
      .put(img.channels.toByte).put(img.pixels)
    buf.array()
  }

  def decodeImage(bytes: Array[Byte]): Option[Image] = {
    if (bytes.length < ImageHeader ||
      !bytes.startsWith(ImageMagic)) return None
    val buf = ByteBuffer.wrap(bytes, 4, 9)
    val (w, h, c) = (buf.getInt(), buf.getInt(), buf.get() & 0xff)
    if (w <= 0 || h <= 0 || c <= 0 ||
      bytes.length != ImageHeader + w * h * c) None
    else Some(Image(w, h, c,
      java.util.Arrays.copyOfRange(bytes, ImageHeader, bytes.length)))
  }

  /** Nearest-neighbor resample — the real pixel math (source coordinate =
    * floor(dst * src/dst), per channel).
    */
  def resizeNearest(img: Image, nw: Int, nh: Int): Image = {
    require(nw > 0 && nh > 0)
    val out = new Array[Byte](nw * nh * img.channels)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * img.height / nh).toInt
      var x = 0
      while (x < nw) {
        val sx = (x.toLong * img.width / nw).toInt
        val src = (sy * img.width + sx) * img.channels
        val dst = (y * nw + x) * img.channels
        var ch = 0
        while (ch < img.channels) {
          out(dst + ch) = img.pixels(src + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    Image(nw, nh, img.channels, out)
  }

  def encodeVideo(info: VideoInfo, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.length == info.nFrames)
    require(frames.forall(_.length == info.frameBytes))
    val buf = ByteBuffer.allocate(VideoHeader + info.nFrames * info.frameBytes)
    buf.put(VideoMagic).putInt(info.nFrames).putInt(info.width)
      .putInt(info.height).put(info.channels.toByte)
    frames.foreach(buf.put)
    buf.array()
  }

  def decodeVideoInfo(bytes: Array[Byte]): Option[VideoInfo] = {
    if (bytes.length < VideoHeader ||
      !bytes.startsWith(VideoMagic)) return None
    val buf = ByteBuffer.wrap(bytes, 4, 13)
    val info = VideoInfo(buf.getInt(), buf.getInt(), buf.getInt(),
      buf.get() & 0xff)
    if (info.nFrames <= 0 || info.width <= 0 || info.height <= 0 ||
      info.channels <= 0 ||
      bytes.length != VideoHeader + info.nFrames.toLong * info.frameBytes)
      None
    else Some(info)
  }

  /** Extract one frame as a standalone image — real offset arithmetic into
    * the container, no copy of the rest of the payload.
    */
  def frameAt(bytes: Array[Byte], info: VideoInfo, i: Int): Image = {
    require(i >= 0 && i < info.nFrames)
    val start = info.frameOffset(i).toInt
    Image(info.width, info.height, info.channels,
      java.util.Arrays.copyOfRange(bytes, start, start + info.frameBytes))
  }
}
