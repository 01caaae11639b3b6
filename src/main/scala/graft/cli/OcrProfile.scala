package graft.cli

import graft.image.{PgmCodec, SynthMediaStore, SynthRenderer}
import graft.ocr.{Deskew, OcrEngine, Otsu}

/** Dev-only component profiler for the per-image OCR cost. */
object OcrProfile {
  def main(args: Array[String]): Unit = {
    val vocab = graft.fixtures.Vocab.Sentences
    val page = (0 until 10).map(i => vocab(i % vocab.length)).mkString(" ")
    val engine = new OcrEngine(graft.ocr.GlyphClassifier.default)
    val n = 300
    def time(label: String)(body: => Unit): Unit = {
      var i = 0
      while (i < 50) { body; i += 1 } // warmup
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { body; i += 1 }
      println(f"$label: ${(System.nanoTime() - t0) / 1e6 / n}%.3f ms/image")
    }
    val ref = SynthMediaStore.ref(page, 1250, 3000, 7L)
    time("fetch(render+encode)") { SynthMediaStore.fetch(ref) }
    val bytes = SynthMediaStore.fetch(ref)
    time("decode") { PgmCodec.decode(bytes) }
    val img = PgmCodec.decode(bytes)
    time("binarize") { Otsu.binarize(img) }
    val bin = Otsu.binarize(img)
    println(s"image ${img.width}x${img.height}, ink ${bin.inkCount}")
    time("rankedAngles") { Deskew.rankedAngles(bin) }
    val angles = Deskew.rankedAngles(bin)
    time("unshear") { Deskew.unshear(bin, angles.head) }
    time("recognize-at-known-angle") {
      // unshear + segmentation + classification + letter forms
      val straight = Deskew.unshear(bin, angles.head)
      val bands = graft.ocr.Segmentation.lineBands(straight)
      bands.foreach(b => graft.ocr.Segmentation.segmentLine(straight, b))
    }
    time("full recognize") { engine.recognize(img) }
    time("end-to-end span") {
      val im = PgmCodec.decode(SynthMediaStore.fetch(ref))
      graft.text.ArabicNormalizer.normalizeBasicFast(engine.recognize(im).text)
    }
  }
}
