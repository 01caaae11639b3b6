package graft.image

/** 8-bit grayscale raster. Replaces the reference's numpy BGR matrices
  * (cv2.imdecode at scripts/all-pdf-to-json-smart.py:95-96) — our OCR
  * pipeline operates on grayscale only.
  *
  * Pixels are stored row-major as unsigned bytes; use `apply(x, y)`
  * for the 0..255 int view. Kept as Array[Byte] (not Int) so a task
  * holding a batch of page images stays memory-lean at scale.
  */
final class GrayImage(val width: Int, val height: Int, val pixels: Array[Byte]) {
  require(pixels.length == width * height, s"bad raster: ${pixels.length} != $width*$height")
  @inline def apply(x: Int, y: Int): Int = pixels(y * width + x) & 0xff
  @inline def set(x: Int, y: Int, v: Int): Unit = pixels(y * width + x) = v.toByte

  /** 256-bucket intensity histogram (input to Otsu). */
  def histogram: Array[Int] = {
    val h = new Array[Int](256)
    var i = 0
    while (i < pixels.length) { h(pixels(i) & 0xff) += 1; i += 1 }
    h
  }
}

object GrayImage {
  def filled(width: Int, height: Int, v: Int): GrayImage = {
    val px = new Array[Byte](width * height)
    java.util.Arrays.fill(px, v.toByte)
    new GrayImage(width, height, px)
  }
}

/** Binarized raster: true = ink. Output of Otsu thresholding.
  *
  * Bit-packed (64 pixels per long, row-major words): page-scale OCR is
  * memory-bandwidth-bound at high task parallelism, and the binary
  * raster is copied once per deskew, so 8x fewer bytes than a
  * Boolean[] directly lifts the N->4N scaling ceiling.
  */
final class BinaryImage(val width: Int, val height: Int, val words: Array[Long]) {
  val wordsPerRow: Int = (width + 63) >>> 6
  @inline def apply(x: Int, y: Int): Boolean =
    ((words(y * wordsPerRow + (x >>> 6)) >>> (x & 63)) & 1L) != 0L
  @inline def set(x: Int, y: Int, v: Boolean): Unit = {
    val i = y * wordsPerRow + (x >>> 6)
    val m = 1L << (x & 63)
    if (v) words(i) |= m else words(i) &= ~m
  }
  def inkCount: Int = {
    var n = 0; var i = 0
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }
  /** true iff any pixel in row y is ink */
  def rowHasInk(y: Int): Boolean = {
    var i = y * wordsPerRow
    val end = i + wordsPerRow
    while (i < end) { if (words(i) != 0L) return true; i += 1 }
    false
  }
  /** visit every ink pixel of row y (ascending x) */
  @inline def foreachInkInRow(y: Int)(f: Int => Unit): Unit = {
    var wi = 0
    while (wi < wordsPerRow) {
      var w = words(y * wordsPerRow + wi)
      val base = wi << 6
      while (w != 0L) {
        val tz = java.lang.Long.numberOfTrailingZeros(w)
        val x = base + tz
        if (x < width) f(x)
        w &= w - 1
      }
      wi += 1
    }
  }
}

object BinaryImage {
  def blank(width: Int, height: Int): BinaryImage =
    new BinaryImage(width, height, new Array[Long](((width + 63) >>> 6) * height))
}

/** Minimal deterministic image codec: binary PGM (P5). Stands in for
  * the reference's PNG page renders (page.get_pixmap(...).tobytes("png"),
  * smart.py:91-92) without an external imaging dependency; the Spark
  * plumbing (binary payloads decoded inside mapPartitions) is identical.
  */
object PgmCodec {
  def encode(img: GrayImage): Array[Byte] = {
    val header = s"P5\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  def decode(bytes: Array[Byte]): GrayImage = {
    // header: "P5" <ws> width <ws> height <ws> maxval <single ws> raster
    var i = 0
    def skipWs(): Unit = { while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1 }
    def token(): String = {
      skipWs()
      val s = i
      while (i < bytes.length && !bytes(i).toChar.isWhitespace) i += 1
      new String(bytes, s, i - s, "US-ASCII")
    }
    val magic = token()
    require(magic == "P5", s"not a P5 PGM: $magic")
    val w = token().toInt
    val h = token().toInt
    val maxv = token().toInt
    require(maxv == 255, s"unsupported maxval $maxv")
    i += 1 // exactly one whitespace byte before raster
    val px = new Array[Byte](w * h)
    System.arraycopy(bytes, i, px, 0, w * h)
    new GrayImage(w, h, px)
  }
}
