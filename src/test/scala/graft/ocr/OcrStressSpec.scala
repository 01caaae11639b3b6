package graft.ocr

import graft.image._
import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive deterministic roundtrip stress: random charset strings x
  * skew angles x noise levels must recognize EXACTLY (pre-normalization
  * identity up to whitespace collapse) — the exact span-sequence
  * equality bar from BASELINE.json, exercised at the engine level.
  */
class OcrStressSpec extends AnyFunSuite {

  private val letters = "اآأإؤدذرزوةبتثجحخسشصضطظعغفقكلمنهيئىء0123456789./،()-:".toIndexedSeq

  private final class Rng(seed0: Long) {
    private var s = seed0
    def next(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(b: Int): Int = ((next() >>> 1) % b).toInt
  }

  private def randomText(rng: Rng): String = {
    val nWords = 1 + rng.nextInt(14)
    (0 until nWords).map { _ =>
      val len = 1 + rng.nextInt(9)
      (0 until len).map(_ => letters(rng.nextInt(letters.length))).mkString
    }.mkString(" ")
  }

  test("roundtrip exact over 300 random texts x skew x noise") {
    val engine = new OcrEngine(GlyphClassifier.default)
    val rng = new Rng(20260816L)
    val angles = Seq(-3000, -2250, -1000, 0, 250, 1500, 2750)
    val noises = Seq(0, 2000, 6000, 10000)
    var checked = 0
    (0 until 300).foreach { i =>
      val t = randomText(rng)
      val angle = angles(rng.nextInt(angles.length))
      val noise = noises(rng.nextInt(noises.length))
      val img = SynthRenderer.render(t, angle, noise, rng.next())
      val res = engine.recognize(img)
      val want = t.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(res.text == want, s"i=$i angle=$angle noise=$noise text='$t' got='${res.text}'")
      assert(res.formViolations == 0, s"i=$i form violations")
      checked += 1
    }
    assert(checked == 300)
  }

  test("multi-line wrap preserves word order") {
    val engine = new OcrEngine(GlyphClassifier.default)
    val long = (1 to 40).map(i => s"كلمه$i").mkString(" ")
    val img = SynthRenderer.render(long, 1250, 3000, 99L)
    assert(SynthRenderer.layout(long).lines.size > 1)
    val res = engine.recognize(img)
    assert(res.text == long)
    assert(res.linesSegmented == SynthRenderer.layout(long).lines.size)
  }
}
