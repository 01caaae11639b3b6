package graft.model

/** Core data model for the interleaved-document extraction engine.
  *
  * Mirrors the observable contract of the reference pipeline
  * (mozaloom/arabic-ocr): a corpus of documents, each a sequence of
  * pages that are either "text" (direct-extraction path,
  * scripts/all-pdf-to-json-smart.py:166-170) or "image" (OCR path,
  * smart.py:150-163), re-expressed as the span shape required by
  * BASELINE.json's input_hint:
  * `(doc_id string, spans array<struct<kind,text,media_ref,offset>>)`.
  *
  * Spans stay NESTED end-to-end: per-document page order is the array
  * order (by `offset`), so document reassembly (smart.py:178) is a
  * within-row operation and needs no shuffle — the property that lets
  * the pipeline scale to very large corpora with a single explicit
  * repartition.
  */
final case class Span(
    kind: String, // "text" | "image"
    text: String, // populated iff kind == "text" (input) / extracted text (output)
    media_ref: String, // populated iff kind == "image"
    offset: Int // 0-based position within the document
)

final case class Doc(doc_id: String, spans: Seq[Span])

/** One recognized line inside an OCR'd span: text + mean glyph
  * confidence, analogous to the reference's PaddleOCR line results
  * `[bbox, (text, confidence)]` (src/ocr/paddleocr_backend.py:63).
  */
final case class OcrLine(text: String, confidence: Double, y0: Int, y1: Int)

/** Per-document extraction metrics (FIXTURES.md §2).
  *
  * `conf_histogram` is 10 buckets over [0,1] of per-glyph confidences;
  * direct/ocr/failed span counts mirror the reference's processing
  * summary (smart.py:180, smart-structured.py:150-156).
  */
final case class DocMetrics(
    lines_segmented: Int,
    glyphs_classified: Int,
    conf_histogram: Seq[Int],
    // pooled mean glyph confidence (flat A5 semantics,
    // tesseract_backend.py:170,192); 0.0 when no glyphs — the
    // quality-gate column a training pipeline filters on
    mean_confidence: Double,
    ocr_spans: Int,
    direct_spans: Int,
    failed_spans: Int
)

/** Output row: same span shape (text spans byte-identical, image spans
  * carry recognized+normalized text) + metrics + nullable error.
  */
final case class ExtractedDoc(
    doc_id: String,
    spans: Seq[Span],
    metrics: DocMetrics,
    error: Option[String]
)

/** Checkpoint/lineage row (FIXTURES.md §3): one per completed input
  * partition, enabling partition-granular resume via anti-join.
  */
final case class CheckpointRow(
    run_id: String,
    partition_id: Int,
    doc_count: Long,
    lines_segmented: Long,
    glyphs_classified: Long,
    ocr_spans: Long,
    direct_spans: Long,
    failed_spans: Long,
    completed_at: Long // epoch millis
)
