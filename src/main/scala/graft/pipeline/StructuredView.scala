package graft.pipeline

import graft.text.{DocumentAnalyzer => DA, TextStats => TS}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** The reference's STRUCTURED output format (SURVEY.md §1.2) as one
  * nested projection over the extraction output — the schema a user of
  * `all-pdf-to-json-smart-structured.py` (:130-260) gets per document:
  *
  *   metadata        {filename, total_pages, extraction_method}
  *   document_info   {title, author, subject, creator, producer,
  *                    creation_date, modification_date}
  *   processing_info {smart_detection_used, ocr_pages, direct_pages,
  *                    failed_pages, processing_summary}
  *   content {
  *     full_text, pages[{page_number, extraction_method,
  *       needs_ocr_detected, raw_text_preview, cleaned_text,
  *       character_count, word_count, has_content, processing_success}],
  *     summary {total_characters, total_words, non_empty_pages,
  *              language_detected},
  *     document_analysis {document_type, confidence, legal_terms_found,
  *                        article_count, contains_dates, key_patterns}
  *   }
  *
  * Built entirely from built-in expressions + the native term-counting
  * expression: a chain of narrow projections after the extraction
  * stage — no join, no shuffle, whole-stage codegen throughout.
  */
object StructuredView {

  /** Python `page_text.strip()` truthiness == contains a non-whitespace
    * char. Spark trim() strips only ASCII spaces, so a "\t"-only direct
    * span would wrongly count as content under trim-based emptiness.
    */
  private def hasContent(t: Column): Column = t.rlike("\\S")

  private def cleanedNonEmpty(spans: Column): Column =
    filter(transform(spans, sp => sp.getField("text")), t => hasContent(t))

  /** Build the nested structured document from ExtractionJob output
    * (doc_id, spans sorted by offset, metrics).
    */
  def build(extracted: DataFrame): DataFrame = {
    // reference page loop: pages in order, cleaned text per page,
    // full_text joins the non-empty ones with \n\n (:243-244).
    // Materialize the non-empty page texts ONCE — full_text, the two
    // failed_pages uses and non_empty_pages all derive from it
    val withFt = extracted.select(col("doc_id"), col("spans"), col("metrics"),
      cleanedNonEmpty(col("spans")).as("ne_texts"))
      .select(col("doc_id"), col("spans"), col("metrics"),
        array_join(col("ne_texts"), "\n\n").as("full_text"),
        size(col("ne_texts")).as("ne_count"))
    val withLower = withFt.select(col("*"), lower(col("full_text")).as("lowered_txt"))
    // all 21 term counts in one native single-pass call (materialized
    // in its own projection so the 10 downstream references stay cheap
    // array lookups)
    val tc = ColumnBridge.column(graft.functions.CountTermCategories(
      ColumnBridge.expression(col("lowered_txt")), DA.Categories.map(_._2)))
    val withTc = withLower.select(col("*"), tc.as("tc"))

    val cntCols = DA.Categories.zipWithIndex.map { case ((cat, _), i) =>
      cat -> element_at(col("tc"), i + 1)
    }
    val (docType, confidence) = DA.docTypeCols(cntCols)

    val pages = transform(col("spans"), sp => {
      val txt = sp.getField("text")
      struct(
        (sp.getField("offset") + 1).as("page_number"),
        when(sp.getField("kind") === "image", "PaddleOCR").otherwise("PyMuPDF")
          .as("extraction_method"),
        (sp.getField("kind") === "image").as("needs_ocr_detected"),
        // raw text layer preview (:212-214): scanned pages have no
        // text layer in the span model -> "" for image spans
        when(sp.getField("kind") === "image", lit(""))
          .otherwise(when(length(txt) > 500, concat(substring(txt, 1, 500), lit("...")))
            .otherwise(txt)).as("raw_text_preview"),
        txt.as("cleaned_text"),
        length(txt).as("character_count"),
        TS.wsTokenCountCol(txt).as("word_count"),
        hasContent(txt).as("has_content"),
        hasContent(txt).as("processing_success"))
    })

    val allTerms = DA.Categories.flatMap(_._2)
    val analysis = struct(
      docType.as("document_type"),
      confidence.as("confidence"),
      // found terms in category-then-term order (:302-304)
      filter(array(allTerms.map(lit): _*), t => contains(col("lowered_txt"), t))
        .as("legal_terms_found"),
      DA.articleCountCol(col("full_text")).as("article_count"),
      DA.containsDatesCol(col("full_text")).as("contains_dates"),
      DA.keyPatternsCol(col("full_text")).as("key_patterns"))

    withTc.select(
      col("doc_id"),
      struct(
        concat(col("doc_id"), lit(".pdf")).as("filename"),
        size(col("spans")).as("total_pages"),
        lit("Smart Hybrid (graft)").as("extraction_method")).as("metadata"),
      // field-for-field parity with the reference's document_info
      // (smart-structured.py:141-149): PDF embedded metadata. The span
      // data model carries none (media_ref resolves to raw pixels), so
      // every field is null — exactly what the reference emits for a
      // PDF without metadata ('' .strip() or None -> None).
      struct(
        lit(null).cast("string").as("title"),
        lit(null).cast("string").as("author"),
        lit(null).cast("string").as("subject"),
        lit(null).cast("string").as("creator"),
        lit(null).cast("string").as("producer"),
        lit(null).cast("string").as("creation_date"),
        lit(null).cast("string").as("modification_date")).as("document_info"),
      struct(
        lit(true).as("smart_detection_used"),
        col("metrics.ocr_spans").as("ocr_pages"),
        col("metrics.direct_spans").as("direct_pages"),
        // reference definition (:236-238): a failed page is any page
        // whose cleaned text is empty — distinct from the pipeline
        // metric failed_spans (OCR errors only)
        (size(col("spans")) - col("ne_count")).as("failed_pages"),
        concat(col("metrics.direct_spans"), lit(" direct, "),
          col("metrics.ocr_spans"), lit(" OCR, "),
          size(col("spans")) - col("ne_count"), lit(" failed"))
          .as("processing_summary"))
        .as("processing_info"),
      struct(
        col("full_text"),
        pages.as("pages"),
        struct(
          length(col("full_text")).as("total_characters"),
          TS.wsTokenCountCol(col("full_text")).as("total_words"),
          col("ne_count").as("non_empty_pages"),
          lit("Arabic").as("language_detected")).as("summary"),
        analysis.as("document_analysis")).as("content"))
  }

  /** Flattened scalar projection of the structured view (the
    * oracle-checkable face; the nested shape is pinned in tests).
    */
  def flat(extracted: DataFrame): DataFrame =
    build(extracted).select(
      col("doc_id"),
      col("metadata.total_pages").cast("long").as("total_pages"),
      col("processing_info.ocr_pages").cast("long").as("ocr_pages"),
      col("processing_info.direct_pages").cast("long").as("direct_pages"),
      col("processing_info.failed_pages").cast("long").as("failed_pages"),
      col("content.summary.total_characters").cast("long").as("total_characters"),
      col("content.summary.total_words").cast("long").as("total_words"),
      col("content.summary.non_empty_pages").cast("long").as("non_empty_pages"),
      col("content.document_analysis.document_type").as("document_type"),
      round(col("content.document_analysis.confidence"), 6).as("confidence"),
      col("content.document_analysis.article_count").cast("long").as("article_count"),
      col("content.document_analysis.contains_dates").as("contains_dates"))
}
