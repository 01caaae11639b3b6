package graft.fixtures

import graft.image.SynthRenderer
import org.scalatest.funsuite.AnyFunSuite

/** Guards the layout assumptions the SQL oracles bake in as constants:
  * the `ocr_lines` / `p3_conf_floor` oracles state line_idx 0 and ONE
  * line per vocab-sentence image. That is only true while every Vocab
  * sentence wraps to a single layout line — this test turns a silent
  * oracle break (adding a longer sentence) into a loud fixture error.
  */
class VocabLayoutSpec extends AnyFunSuite {

  test("every Vocab sentence lays out as exactly one line under MaxTextWidth") {
    Vocab.Sentences.foreach { s =>
      val l = SynthRenderer.layout(s)
      assert(l.lines.size == 1,
        s"oracle invariant broken: '$s' lays out as ${l.lines.size} lines " +
          s"(width ${l.textWidth} vs MaxTextWidth ${SynthRenderer.MaxTextWidth}); " +
          "ocr_lines/p3_conf_floor oracles assume line_idx 0 only")
    }
  }

  test("vocab draws cover every sentence and every angle/noise level") {
    val sentIdx = (0L until 500L).map(Vocab.sentenceIdx1).toSet ++
      (0L until 500L).map(Vocab.sentenceIdx2).toSet
    assert(sentIdx == Vocab.Sentences.indices.toSet, "sentence draw coverage gap")
    val angles = (0L until 500L).map(Vocab.angleIdx1).toSet
    assert(angles == Vocab.Angles.indices.toSet, "angle draw coverage gap")
    val noises = (0L until 500L).map(Vocab.noiseIdx1).toSet
    assert(noises == Vocab.Noises.indices.toSet, "noise draw coverage gap")
  }
}
