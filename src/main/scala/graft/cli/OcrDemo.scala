package graft.cli

import graft.image.{PgmCodec, SynthMediaStore}
import graft.ocr.{GlyphClassifier, OcrEngine}
import graft.text.ArabicNormalizer

/** Tiny CLI demo of the single-image OCR flow a span goes through
  * inside the Spark pipeline: media_ref -> fetch bytes -> decode ->
  * recognize -> normalize. Usage:
  *
  *   runMain graft.cli.OcrDemo <text> [angleMdeg] [noisePpm] [seed]
  *   runMain graft.cli.OcrDemo --ref <media_ref>
  */
object OcrDemo {
  def main(args: Array[String]): Unit = {
    val ref =
      if (args.headOption.contains("--ref")) args(1)
      else {
        val text = args.headOption.getOrElse("نظام المحكمه رقم 1445")
        val angle = if (args.length > 1) args(1).toInt else -1750
        val noise = if (args.length > 2) args(2).toInt else 4000
        val seed = if (args.length > 3) args(3).toLong else 42L
        SynthMediaStore.ref(text, angle, noise, seed)
      }
    println(s"media_ref : $ref")
    val bytes = SynthMediaStore.fetch(ref)
    val img = PgmCodec.decode(bytes)
    println(s"image     : ${img.width}x${img.height} (${bytes.length} bytes PGM)")
    val engine = new OcrEngine(GlyphClassifier.default)
    val res = engine.recognize(img)
    println(s"lines     : ${res.linesSegmented}, glyphs: ${res.glyphsClassified}, formViolations: ${res.formViolations}")
    if (res.glyphConfidences.nonEmpty)
      println(f"confidence: min=${res.glyphConfidences.min}%.3f mean=${res.glyphConfidences.sum / res.glyphConfidences.length}%.3f")
    println(s"raw       : ${res.text}")
    println(s"normalized: ${ArabicNormalizer.normalizeBasic(res.text)}")
    val expected = ArabicNormalizer.normalizeBasic(SynthMediaStore.expectedText(ref))
    println(s"expected  : $expected")
    println(s"exact     : ${ArabicNormalizer.normalizeBasic(res.text) == expected}")
  }
}
