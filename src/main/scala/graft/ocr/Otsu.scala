package graft.ocr

import graft.image.{BinaryImage, GrayImage}

/** Otsu global binarization — the first from-scratch OCR stage (the
  * reference delegates this to its OCR libraries' preprocessing; see
  * SURVEY.md §2.4 O1). Classic maximization of between-class variance
  * over the intensity histogram; pixels <= threshold are ink.
  */
object Otsu {

  /** Threshold t maximizing between-class variance, classes [0..t] and
    * [t+1..255]. Ties resolve to the smallest t (deterministic).
    */
  def threshold(hist: Array[Int]): Int = {
    val total = hist.sum.toLong
    if (total == 0) return 127
    var sumAll = 0L
    var i = 0
    while (i < 256) { sumAll += i.toLong * hist(i); i += 1 }
    var w0 = 0L
    var sum0 = 0L
    var best = -1.0
    var bestT = 127
    var t = 0
    while (t < 255) {
      w0 += hist(t)
      sum0 += t.toLong * hist(t)
      val w1 = total - w0
      if (w0 > 0 && w1 > 0) {
        val m0 = sum0.toDouble / w0
        val m1 = (sumAll - sum0).toDouble / w1
        val between = w0.toDouble * w1 * (m0 - m1) * (m0 - m1)
        if (between > best) { best = between; bestT = t }
      }
      t += 1
    }
    bestT
  }

  /** Pixels sampled for the threshold histogram (statistic only — the
    * binarization pass itself always reads every pixel).
    */
  val HistSample = 16384

  @annotation.tailrec
  private def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)

  def binarize(img: GrayImage): BinaryImage = {
    // stride COPRIME with the row width: an aligned stride samples a
    // fixed column-residue class, which on grid-regular glyph layouts
    // can systematically miss the ink class; a coprime stride sweeps
    // every column phase
    var stride = math.max(1, img.size / HistSample)
    while (stride > 1 && gcd(stride, img.width) != 1) stride -= 1
    var hist: Array[Int] = img.histogram(stride)
    // sparse-ink guard: on a page whose ink fraction is below the
    // sampling rate the sample can miss the ink class entirely, and
    // Otsu would then split the background mode itself. Ink and
    // background modes are far apart (>=100 intensity apart on any
    // real scan), so a narrow sampled intensity spread means either a
    // genuinely blank page or a missed ink class — pay one full pass
    // to be sure
    if (stride > 1) {
      var lo = 255; var hi = 0; var v = 0
      while (v < 256) { if (hist(v) > 0) { if (v < lo) lo = v; if (v > hi) hi = v }; v += 1 }
      if (hi - lo < 100) hist = img.histogram
    }
    val t = threshold(hist)
    val out = BinaryImage.blank(img.width, img.height)
    var y = 0
    while (y < img.height) {
      val rowBase = img.offset + y * img.width
      val wordBase = y * out.wordsPerRow
      var x = 0
      while (x < img.width) {
        if ((img.pixels(rowBase + x) & 0xff) <= t)
          out.words(wordBase + (x >>> 6)) |= (1L << (x & 63))
        x += 1
      }
      y += 1
    }
    out
  }
}
