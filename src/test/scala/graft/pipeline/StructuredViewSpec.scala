package graft.pipeline

import graft.fixtures.DocGen
import graft.text.DocumentAnalyzer
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** StructuredView: the reference's nested output schema
  * (smart-structured.py:130-260) is shape- and value-correct over real
  * extraction output.
  */
class StructuredViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("nested schema matches the reference structured format") {
    val docs = DocGen.synthetic(spark, nDocs = 12, seed = 5L)
    val sv = StructuredView.build(ExtractionJob.extract(spark, docs).toDF)
    val schema = sv.schema
    assert(schema.fieldNames.toSeq ==
      Seq("doc_id", "metadata", "document_info", "processing_info", "content"))
    // document_info: field-for-field with smart-structured.py:141-149;
    // all nullable strings (the span model carries no PDF metadata, so
    // every value is null — the reference's no-metadata case)
    val docInfo = schema("document_info").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(docInfo.fieldNames.toSeq == Seq("title", "author", "subject", "creator",
      "producer", "creation_date", "modification_date"))
    assert(docInfo.fields.forall(f => f.dataType == org.apache.spark.sql.types.StringType))
    val content = schema("content").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(content.fieldNames.toSeq == Seq("full_text", "pages", "summary", "document_analysis"))
    val page = content("pages").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(page.fieldNames.toSeq == Seq("page_number", "extraction_method", "needs_ocr_detected",
      "raw_text_preview", "cleaned_text", "character_count", "word_count", "has_content",
      "processing_success"))
    val analysis = content("document_analysis").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(analysis.fieldNames.toSeq == Seq("document_type", "confidence", "legal_terms_found",
      "article_count", "contains_dates", "key_patterns"))
  }

  test("values match the pure-function expectations per document") {
    val docs = DocGen.synthetic(spark, nDocs = 30, seed = 9L)
    val got = StructuredView.build(ExtractionJob.extract(spark, docs).toDF)
      .collect().map(r => r.getString(0) -> r).toMap
    docs.collect().foreach { in =>
      val expected = DocGen.expectedSpans(in)
      val fullText = expected.map(_.text).filter(_.trim.nonEmpty).mkString("\n\n")
      val r = got(in.doc_id)
      val meta = r.getStruct(1)
      assert(meta.getString(0) == in.doc_id + ".pdf")
      assert(meta.getInt(1) == in.spans.size)
      val docInfo = r.getStruct(2)
      assert((0 until 7).forall(docInfo.isNullAt), "document_info fields must all be null")
      val proc = r.getStruct(3)
      assert(proc.getInt(1) == in.spans.count(_.kind == "image"), "ocr_pages")
      assert(proc.getInt(2) == in.spans.count(_.kind == "text"), "direct_pages")
      assert(proc.getString(4).endsWith(" failed"))
      val content = r.getStruct(4)
      assert(content.getString(0) == fullText, "full_text")
      val pages = content.getSeq[Row](1)
      assert(pages.size == in.spans.size)
      pages.zip(expected).foreach { case (p, sp) =>
        assert(p.getInt(0) == sp.offset + 1, "page_number")
        assert(p.getBoolean(2) == (sp.kind == "image"), "needs_ocr_detected")
        assert(p.getString(4) == sp.text, "cleaned_text")
        assert(p.getInt(5) == sp.text.length, "character_count")
      }
      val summary = content.getStruct(2)
      assert(summary.getInt(0) == fullText.length, "total_characters")
      assert(summary.getInt(2) == expected.count(_.text.trim.nonEmpty), "non_empty_pages")
      val analysis = content.getStruct(3)
      val want = DocumentAnalyzer.analyze(fullText.toLowerCase)
      assert(analysis.getString(0) == want.documentType, "document_type")
      assert(math.abs(analysis.getDouble(1) - want.confidence) < 1e-12, "confidence")
    }
  }
}
