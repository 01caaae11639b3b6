package graft.text

import graft.image.SynthFont
import graft.ocr.LetterForms
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck laws (SURVEY.md §5.2 item 4) — pure JVM, no Spark:
  * single-pass normalizers equal the regex reference forms on
  * adversarial Unicode, enhanced normalization is idempotent, and
  * shaping/resolution round-trips arbitrary charset words.
  */
object NormalizerProps extends Properties("graft.text") {

  // generator biased toward the hostile cases: Arabic letters,
  // diacritics, tatweel, Arabic punctuation, mixed whitespace runs
  private val piece: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf("أ", "إ", "آ", "ة", "ي", "ى", "ء", "نظام", "محكمة", "عقد"),
    3 -> Gen.oneOf("ً", "ٌ", "ّ", "ْ", "ٰ", "ـ"),
    2 -> Gen.oneOf("۔", "؟", "؎", "؍"),
    3 -> Gen.oneOf(" ", "  ", "\t", "\n", "", "\f", "\r"),
    2 -> Gen.oneOf("abc", "123", ".", ""),
    1 -> Gen.asciiPrintableStr,
    1 -> Gen.stringOf(Gen.choose(Char.MinValue, Char.MaxValue)
      .suchThat(c => !Character.isSurrogate(c))))
  private val text: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)

  property("normalizeBasicFast == normalizeBasic") = Prop.forAll(text) { s =>
    ArabicNormalizer.normalizeBasicFast(s) == ArabicNormalizer.normalizeBasic(s)
  }

  property("normalizeEnhancedFast == normalizeEnhanced") = Prop.forAll(text) { s =>
    ArabicNormalizer.normalizeEnhancedFast(s) == ArabicNormalizer.normalizeEnhanced(s)
  }

  property("enhanced normalization is idempotent") = Prop.forAll(text) { s =>
    val once = ArabicNormalizer.normalizeEnhanced(s)
    ArabicNormalizer.normalizeEnhanced(once) == once
  }

  property("basic normalization is idempotent on diacritic-free input") =
    Prop.forAll(text) { s =>
      val clean = s.filterNot(ArabicNormalizer.DiacriticChars.contains(_))
      val once = ArabicNormalizer.normalizeBasic(clean)
      ArabicNormalizer.normalizeBasic(once) == once
    }

  private val charsetWord: Gen[String] = {
    val letters = (SynthFont.Charset - SynthFont.Tatweel).toVector.sorted
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(letters))).map(_.mkString)
  }

  property("shapeWord emits only forms valid for each letter's joining class") =
    Prop.forAll(charsetWord) { w =>
      SynthFont.shapeWord(w).zipWithIndex.forall { case (f, i) =>
        SynthFont.formsOf(w(i)).contains(f)
      }
    }

  property("letter-form resolution round-trips shaped words with zero violations") =
    Prop.forAll(charsetWord) { w =>
      val glyphs = w.zip(SynthFont.shapeWord(w)).map { case (c, f) => SynthFont.GlyphId(c, f) }
      val r = LetterForms.resolveWord(glyphs)
      r.text == w && r.formViolations == 0
    }
}
