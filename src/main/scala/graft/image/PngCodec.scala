package graft.image

import java.util.zip.{Adler32, CRC32, Inflater}

/** From-scratch 8-bit grayscale PNG codec — the reference's actual
  * page-render format (page.get_pixmap(...).tobytes("png"),
  * scripts/all-pdf-to-json-smart.py:91-96; cv2.imdecode consumes it at
  * :95). Closes the last observable format gap of the PGM stand-in
  * (SURVEY.md §2.1 S5).
  *
  * Encoder: color type 0 (grayscale), bit depth 8, filter 0 per row,
  * zlib stream made of STORED (uncompressed) deflate blocks — fully
  * standard PNG that any reader opens, written without any compression
  * dependency. CRC32/Adler32 come from java.util.zip (JDK, not a
  * library dependency).
  *
  * Decoder: parses IHDR, concatenates IDAT, inflates (JDK Inflater, so
  * real compressed PNGs decode too, not just our stored-block ones)
  * and reverses ALL FIVE standard row filters (None/Sub/Up/Average/
  * Paeth) — grayscale-8 only, the one format the pipeline produces.
  */
object PngCodec {

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  @inline def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Signature(i))

  // ---- encode -------------------------------------------------------------

  /** Max payload of one stored deflate block (16-bit LEN field). */
  private val StoredMax = 65535

  def encode(img: GrayImage): Array[Byte] = {
    val w = img.width; val h = img.height
    // raw scanlines: 1 filter byte (0 = None) + w pixels per row
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      // raw(y*(w+1)) = 0 (filter None) — Array[Byte] zero-initialized
      System.arraycopy(img.pixels, img.offset + y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }

    // zlib stream: 2-byte header, stored deflate blocks, Adler32
    val nBlocks = math.max(1, (raw.length + StoredMax - 1) / StoredMax)
    val zlib = new Array[Byte](2 + nBlocks * 5 + raw.length + 4)
    zlib(0) = 0x78; zlib(1) = 0x01 // CMF/FLG: deflate, 32k window, check ok
    var src = 0; var dst = 2
    var b = 0
    while (b < nBlocks) {
      val len = math.min(StoredMax, raw.length - src)
      zlib(dst) = if (b == nBlocks - 1) 1 else 0 // BFINAL, BTYPE=00
      zlib(dst + 1) = (len & 0xff).toByte
      zlib(dst + 2) = ((len >> 8) & 0xff).toByte
      zlib(dst + 3) = (~len & 0xff).toByte
      zlib(dst + 4) = ((~len >> 8) & 0xff).toByte
      System.arraycopy(raw, src, zlib, dst + 5, len)
      src += len; dst += 5 + len
      b += 1
    }
    val adler = new Adler32(); adler.update(raw)
    writeIntBE(zlib, dst, adler.getValue.toInt)

    val ihdr = new Array[Byte](13)
    writeIntBE(ihdr, 0, w); writeIntBE(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    // ihdr(9..12) = 0: color type 0, deflate, adaptive filter, no interlace

    val out = new java.io.ByteArrayOutputStream(zlib.length + 64)
    out.write(Signature, 0, 8)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", zlib)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def writeIntBE(a: Array[Byte], at: Int, v: Int): Unit = {
    a(at) = (v >>> 24).toByte; a(at + 1) = (v >>> 16).toByte
    a(at + 2) = (v >>> 8).toByte; a(at + 3) = v.toByte
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); writeIntBE(len, 0, data.length)
    out.write(len, 0, 4)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32(); crc.update(t); crc.update(data)
    val c = new Array[Byte](4); writeIntBE(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  // ---- decode -------------------------------------------------------------

  private def readIntBE(a: Array[Byte], at: Int): Int =
    ((a(at) & 0xff) << 24) | ((a(at + 1) & 0xff) << 16) | ((a(at + 2) & 0xff) << 8) | (a(at + 3) & 0xff)

  def decode(bytes: Array[Byte]): GrayImage = {
    require(isPng(bytes), "not a PNG (bad signature)")
    var i = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream(bytes.length)
    var sawIhdr = false
    var done = false
    while (!done && i + 8 <= bytes.length) {
      val len = readIntBE(bytes, i)
      val typ = new String(bytes, i + 4, 4, "US-ASCII")
      require(len >= 0 && i + 12 + len <= bytes.length, s"truncated chunk $typ")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          w = readIntBE(bytes, i + 8); h = readIntBE(bytes, i + 12)
          val depth = bytes(i + 16); val color = bytes(i + 17)
          val interlace = bytes(i + 20)
          require(depth == 8 && color == 0, s"unsupported PNG: depth=$depth color=$color")
          require(interlace == 0, "interlaced PNG unsupported")
          sawIhdr = true
        case "IDAT" => idat.write(bytes, i + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: skip
      }
      i += 12 + len
    }
    require(sawIhdr, "missing IHDR")
    // hostile-header guard BEFORE allocation: 65535x65535 would
    // overflow (w+1)*h to a negative array size
    require(w > 0 && h > 0 && (w + 1L) * h <= Int.MaxValue, s"bad PNG dimensions: $w x $h")

    // inflate the zlib stream into filtered scanlines
    val raw = new Array[Byte]((w + 1) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      // ALL input was provided up front, so zero progress means a
      // truncated or unsupported stream (e.g. FDICT preset dictionary:
      // inflate() returns 0 with needsDictionary() set, and a naive
      // needsInput() check would spin forever on it)
      require(n > 0, "truncated or unsupported IDAT stream")
      got += n
    }
    inf.end()
    require(got == raw.length, s"short PNG raster: $got of ${raw.length}")

    // reverse row filters in place into the output raster
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (w + 1)) & 0xff
      val rowIn = y * (w + 1) + 1
      val rowOut = y * w
      var x = 0
      while (x < w) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x > 0) px(rowOut + x - 1) & 0xff else 0
        val up = if (y > 0) px(rowOut - w + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) px(rowOut - w + x - 1) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => cur + paeth(left, up, ul)
          case _ => throw new IllegalArgumentException(s"bad PNG filter $f on row $y")
        }
        px(rowOut + x) = v.toByte
        x += 1
      }
      y += 1
    }
    new GrayImage(w, h, px)
  }

  @inline private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }
}

/** Magic-sniffing decode: PGM (P5) or PNG — the single entry point the
  * extraction stage uses, so a media store may serve either format
  * (the reference corpus is PNG; the zero-copy PGM stays the fast
  * synthetic default).
  */
object ImageCodec {
  def decode(bytes: Array[Byte]): GrayImage =
    if (PngCodec.isPng(bytes)) PngCodec.decode(bytes)
    else PgmCodec.decode(bytes)
}
