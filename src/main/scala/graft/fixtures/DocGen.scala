package graft.fixtures

import graft.image.SynthMediaStore
import graft.model.{Doc, Span}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic interleaved-document fixture generators (FIXTURES.md §4).
  *
  * The span-shaped input table `(doc_id, spans[])` required by
  * BASELINE.json's input_hint does not exist in the driver testdata, so
  * it is synthesized — deterministically, with ground truth embedded in
  * each image span's `synth://` media_ref. Text-span content is sourced
  * from the driver's flat documents table (deterministic raw material,
  * FIXTURES.md §5) or the embedded vocabulary.
  */
object DocGen {

  /** Span table derived 1:1 from the driver's documents.parquet rows.
    * Every field is a pure function of (doc_id, text), which is what
    * lets the DuckDB oracle re-state the expected pipeline output as
    * plain SQL over the same parquet (see SparkEntry.oracleSql).
    *
    * Layout per doc: [text span, image span, image span], offsets 0..2.
    */
  def fromDriverDocs(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) => driverDoc(id, text) }
  }

  /** Noise-free twin of fromDriverDocs (every image span rendered at
    * noise 0): per-glyph confidence is exactly 1.0, which makes
    * confidence-floor queries trivially oracle-statable
    * (SparkEntry `ocr_conf_filter` / `p3_conf_floor`).
    */
  def fromDriverDocsClean(spark: SparkSession, sfDir: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) => driverDoc(id, text, noiseFree = true) }
  }

  /** Pure construction shared with tests. */
  def driverDoc(id: Long, text: String, noiseFree: Boolean = false): Doc = {
    val s1 = Vocab.Sentences(Vocab.sentenceIdx1(id))
    val s2 = Vocab.Sentences(Vocab.sentenceIdx2(id))
    val n1 = if (noiseFree) 0 else Vocab.Noises(Vocab.noiseIdx1(id))
    val n2 = if (noiseFree) 0 else Vocab.Noises(Vocab.noiseIdx2(id))
    Doc(
      doc_id = s"doc-$id",
      spans = Seq(
        // truncate on CODEPOINTS (matching the oracle's substr
        // semantics); a UTF-16-unit cut could split a surrogate pair
        Span("text", text.substring(0,
          text.offsetByCodePoints(0, math.min(120, text.codePointCount(0, text.length)))), "", 0),
        Span("image", "", SynthMediaStore.ref(s1, Vocab.Angles(Vocab.angleIdx1(id)), n1, id), 1),
        Span("image", "", SynthMediaStore.ref(s2, Vocab.Angles(Vocab.angleIdx2(id)), n2, id * 2 + 1), 2)
      )
    )
  }

  /** Fully synthetic corpus with a Zipf-skewed image-span count: a few
    * documents carry most of the OCR work (the "image-heavy documents"
    * skew the salted repartition + AQE must absorb; SURVEY.md §7.5).
    * Spans are emitted in SHUFFLED array order to exercise offset-based
    * order restoration.
    */
  def synthetic(spark: SparkSession, nDocs: Int, seed: Long,
                maxSpans: Int = 12, imageRatio: Double = 0.3,
                skewed: Boolean = false, sentencesPerImage: Int = 1): Dataset[Doc] = {
    import spark.implicits._
    spark.range(nDocs).map(i => syntheticDoc(i, seed, maxSpans, imageRatio, skewed, sentencesPerImage))
  }

  def syntheticDoc(i: Long, seed: Long, maxSpans: Int, imageRatio: Double, skewed: Boolean,
                   sentencesPerImage: Int = 1): Doc = {
    var s = mix(seed ^ (i * 0x9e3779b97f4a7c15L))
    def next(): Long = { s = mix(s); s }
    def nextInt(b: Int): Int = ((next() >>> 1) % b).toInt
    // Zipf-ish: ~5% of docs get the max span count (hot keys); doc 0 is
    // always hot so small fixtures are guaranteed skewed
    val hot = skewed && (i == 0 || nextInt(100) < 5)
    val n = if (hot) maxSpans * 4 else 1 + nextInt(maxSpans)
    val spans = (0 until n).map { off =>
      if (nextInt(1000) < (imageRatio * 1000).toInt || hot) {
        // page-like image span: sentencesPerImage sentences wrap into a
        // multi-line page (bench realism: a scanned page is hundreds of
        // glyphs, not one headline)
        val page = (0 until sentencesPerImage)
          .map(_ => Vocab.Sentences(nextInt(Vocab.V))).mkString(" ")
        val angle = Vocab.Angles(nextInt(Vocab.Angles.length))
        val noise = Vocab.Noises(nextInt(Vocab.Noises.length))
        Span("image", "", SynthMediaStore.ref(page, angle, noise, next()), off)
      } else Span("text", Vocab.Sentences(nextInt(Vocab.V)), "", off)
    }
    // deterministic shuffle of the array order (offset must restore it)
    val shuffled = spans.sortBy(sp => mix(seed ^ i ^ sp.offset.toLong))
    Doc(f"doc-$i%08d", shuffled)
  }

  /** Oracle for `synthetic`: the exact expected output spans (sorted by
    * offset), derived from the same draws — image text normalized, text
    * spans untouched.
    */
  def expectedSpans(doc: Doc): Seq[Span] =
    doc.spans.sortBy(_.offset).map { sp =>
      if (sp.kind == "image")
        sp.copy(text = graft.text.ArabicNormalizer.normalizeBasic(
          SynthMediaStore.expectedText(sp.media_ref)))
      else sp
    }

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
