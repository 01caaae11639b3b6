package graft.ocr

import graft.image.SynthFont
import graft.image.SynthFont.GlyphId

/** Contextual Arabic letter-form resolution (north star: "contextual
  * Arabic letter-form resolution (isolated/initial/medial/final)").
  *
  * The classifier emits (character, contextual form) pairs; this stage
  * resolves them back to the logical character sequence and validates
  * that the recognized forms are consistent with the standard Arabic
  * joining rules (Unicode ArabicShaping) — inconsistencies are counted
  * as `formViolations`, a recognition-quality signal surfaced in the
  * per-partition metrics.
  */
object LetterForms {

  final case class Resolved(text: String, formViolations: Int)

  /** Resolve one word's recognized glyph sequence (logical order). */
  def resolveWord(glyphs: Seq[GlyphId]): Resolved = {
    val chars = new Array[Char](glyphs.length)
    var i = 0
    glyphs.foreach { g => chars(i) = g.c; i += 1 }
    val s = new String(chars)
    val expected = SynthFont.shapeWord(s)
    var violations = 0
    i = 0
    while (i < glyphs.length) {
      if (glyphs(i).form != expected(i)) violations += 1
      i += 1
    }
    Resolved(s, violations)
  }
}
