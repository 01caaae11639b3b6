package graft.ocr

import graft.image.{BinaryImage, SynthRenderer}

/** Projection-profile deskew via angle search (SURVEY.md §2.4 O1:
  * "projection-profile deskew (angle search)").
  *
  * The skew model is a vertical shear (column x shifted down by
  * shiftY(angle, x)); candidate angles are scored by the "peakiness"
  * of the horizontal projection after unshearing — sum of squared row
  * counts, which is strictly maximal when text rows realign into their
  * 10-pixel bands (splitting a band's count c into a+b, a,b>0 always
  * lowers a²+b²). The shear is exactly invertible on the pixel grid,
  * so the detected angle restores the unskewed raster bit-exactly.
  */
object Deskew {

  /** Candidate grid, millidegrees. Must cover the renderer's range. */
  val AngleGridMdeg: IndexedSeq[Int] = {
    val grid = (-3000 to 3000 by 250).toIndexedSeq
    // evaluate in |angle|-ascending order so score ties resolve to the
    // smallest skew (identical pixel mappings on narrow images)
    grid.sortBy(a => (math.abs(a), a))
  }

  @inline private def shift(angleMdeg: Int, x: Int): Int = SynthRenderer.shiftY(angleMdeg, x)

  /** Candidate angles ranked best-first. Primary criterion: fewest
    * occupied rows after unshearing (the true angle realigns every
    * text line into exactly GlyphH rows; any materially different
    * mapping pokes pixels out of a band). Secondary: peakiness
    * (sum of squared row counts). Ties resolve toward zero skew.
    * The engine validates the top candidate structurally and falls
    * back down this ranking on the rare narrow-image ambiguity.
    *
    * Coarse-to-fine: the full grid is scored at 500 mdeg, then the
    * 250-mdeg neighbors of the best few coarse angles are scored — a
    * ±250 mdeg mapping differs by at most ~2 rows at page width, so
    * the true angle's neighborhood always ranks near the top of the
    * coarse pass; the engine's structural-validation fallback walks
    * the FULL ranked list regardless, so exactness never depends on
    * the pruning (15 ink passes instead of 25).
    */
  def rankedAngles(bin: BinaryImage): IndexedSeq[Int] = {
    if (bin.inkCount == 0) return IndexedSeq(0)
    val maxAbsShift = math.abs(shift(3000, bin.width - 1)) + 1
    val rows = new Array[Int](bin.height + 2 * maxAbsShift)
    val shiftX = new Array[Int](bin.width) // reused across angles
    val wpr = bin.wordsPerRow

    // NOTE: the score must NOT sample source rows (tried and
    // reverted): unshearing mixes row parities at nonzero angles but
    // not at zero, so sampling halves angle-0's occupied count while
    // leaving the true angle's intact — systematically misranking
    // toward zero skew.
    def score(a: Int): (Int, Int, Long) = {
      java.util.Arrays.fill(rows, 0)
      // per-column shift lookup: one tan() per angle, not per pixel
      val tanA = Math.tan(a / 1000.0 * Math.PI / 180.0)
      var x = 0
      while (x < bin.width) { shiftX(x) = Math.round(tanA * x).toInt; x += 1 }
      // iterate the packed raster directly: ~width*height/8 bytes per
      // angle instead of re-reading a per-pixel coordinate list
      var y = 0
      while (y < bin.height) {
        val base = y + maxAbsShift
        var wi = 0
        while (wi < wpr) {
          var w = bin.words(y * wpr + wi)
          val xBase = wi << 6
          while (w != 0L) {
            rows(base - shiftX(xBase + java.lang.Long.numberOfTrailingZeros(w))) += 1
            w &= w - 1
          }
          wi += 1
        }
        y += 1
      }
      var occupied = 0
      var peak = 0L
      var r = 0
      while (r < rows.length) {
        val c = rows(r).toLong
        if (c > 0) occupied += 1
        peak += c * c
        r += 1
      }
      (a, occupied, peak)
    }

    val coarse = AngleGridMdeg.filter(_ % 500 == 0).map(score)
    val bestCoarse = coarse.sortBy { case (a, occ, peak) => (occ, -peak, math.abs(a), a) }
    // refine around the top 2 coarse angles (covers a true angle that
    // sits between two coarse cells whose scores straddle it)
    val refineSet = bestCoarse.take(2).flatMap { case (a, _, _) => Seq(a - 250, a + 250) }
      .filter(a => a >= -3000 && a <= 3000).distinct
    val scored = coarse ++ refineSet.map(score)
    val rankedScored = scored.sortBy { case (a, occ, peak) => (occ, -peak, math.abs(a), a) }
    // unscored fine angles follow as the exactness tail (|angle| order)
    val seen = rankedScored.map(_._1).toSet
    rankedScored.map(_._1) ++ AngleGridMdeg.filterNot(seen)
  }

  /** Best single angle (convenience; the engine uses rankedAngles). */
  def detectAngle(bin: BinaryImage): Int = rankedAngles(bin).head

  /** Invert the shear for the given angle. */
  def unshear(bin: BinaryImage, angleMdeg: Int): BinaryImage = {
    if (angleMdeg == 0) return bin
    val sEdge = shift(angleMdeg, bin.width - 1)
    val off = math.max(0, sEdge) // positive angles shifted down; restore up
    val newH = bin.height + math.abs(sEdge)
    val out = BinaryImage.blank(bin.width, newH)
    val shiftX = Array.tabulate(bin.width)(x => shift(angleMdeg, x))
    var y = 0
    while (y < bin.height) {
      val yy = y
      bin.foreachInkInRow(yy) { x =>
        val ny = yy - shiftX(x) + off
        if (ny >= 0 && ny < newH) out.set(x, ny, true)
      }
      y += 1
    }
    out
  }
}
