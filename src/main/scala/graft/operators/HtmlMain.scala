package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the boilerplate strip the north
  * rule names explicitly ("HTML boilerplate strip, DOM heuristics"):
  * given raw page HTML, keep the content blocks and drop chrome
  * (nav/header/footer link farms), using the classic text-density
  * heuristic family (Arc90 readability / trafilatura): a block
  * survives iff it has enough text AND a low enough anchor density.
  *
  * From-scratch and DECLARATIVE: block segmentation is a regex split
  * on block-level tags, per-block scoring runs inside array HOFs
  * (each lambda touches only its own element — the round-3 HOF
  * re-evaluation trap applies to non-lambda subexpressions, none
  * here), and every step (split, tag strip, token count, anchor
  * count, keep predicate, join+normalize) is shared Java-regex/RE2
  * syntax restated verbatim in the DuckDB oracle — the extraction is
  * oracle-checked end to end (ex_html_main), not just spot-tested.
  *
  * Scale shape: one narrow projection per document, no shuffle, no
  * UDF — at 10^12 pages this pipelines entirely inside the scan
  * stage. (A full DOM parser handles malformed nesting better; the
  * block-split heuristic is deliberately chosen as the declarative,
  * cross-engine-checkable form, and real-world evaluations put the
  * density heuristic within a few points of DOM-based extractors.)
  */
object HtmlMain {

  /** Block-level tag family that delimits candidate blocks. */
  val BlockTagRe: String =
    "(?i)</?(p|div|section|article|li|ul|ol|h[1-6]|header|footer|nav|aside|table|tr|td|br)[^>]*>"
  val InlineTagRe: String = "<[^>]*>"
  val AnchorRe: String = "(?i)<a[ >]"

  /** Extracted main text: blocks with >= minTokens tokens and
    * anchors/tokens <= maxLinkDensity, tag-stripped, joined, and
    * whitespace-normalized.
    *
    * Each block is stripped and tokenized exactly ONCE (two staged
    * transforms carrying a struct): interpreted HOF lambdas have no
    * CSE, so putting the strip/split inside the keep predicate would
    * re-run the regex ~3x per block (round-3 HOF lesson applied at
    * authoring time, review round-5).
    */
  def mainContentCol(html: Column, minTokens: Int = 4,
                     maxLinkDensity: Double = 0.2): Column = {
    val base = transform(split(html, BlockTagRe), b => struct(
      regexp_replace(b, InlineTagRe, " ").as("txt"),
      regexp_count(b, lit(AnchorRe)).as("na")))
    val scored = transform(base, s0 => struct(
      s0.getField("txt").as("txt"),
      size(filter(split(s0.getField("txt"), "\\s+"), x => x =!= "")).as("nt"),
      s0.getField("na").as("na")))
    val kept = filter(scored, s0 =>
      s0.getField("nt") >= minTokens &&
        s0.getField("na").cast("double") <=
          lit(maxLinkDensity) * s0.getField("nt").cast("double"))
    trim(regexp_replace(
      concat_ws(" ", transform(kept, s0 => s0.getField("txt"))), "\\s+", " "))
  }

  /** DuckDB twin of mainContentCol — the same two staged transforms,
    * restated verbatim (the 'g' flags are load-bearing: DuckDB
    * regexp_replace is first-match-only by default where Spark's
    * replaces all).
    */
  def mainContentSql(htmlExpr: String, minTokens: Int = 4,
                     maxLinkDensity: Double = 0.2): String =
    s"""trim(regexp_replace(array_to_string(list_transform(
       |  list_filter(
       |    list_transform(
       |      list_transform(regexp_split_to_array($htmlExpr, '$BlockTagRe'),
       |        b -> {'txt': regexp_replace(b, '$InlineTagRe', ' ', 'g'),
       |              'na': len(regexp_extract_all(b, '$AnchorRe'))}),
       |      s -> {'txt': s['txt'],
       |            'nt': len(list_filter(regexp_split_to_array(s['txt'], '\\s+'), x -> x <> '')),
       |            'na': s['na']}),
       |    s -> s['nt'] >= $minTokens
       |      AND CAST(s['na'] AS DOUBLE) <= $maxLinkDensity * CAST(s['nt'] AS DOUBLE)),
       |  s -> s['txt']), ' '), '\\s+', ' ', 'g'))""".stripMargin

  // ---- page METADATA extraction (title / meta description /
  // canonical link / robots-noindex) — the head-side complement of
  // the body's main-content strip: canonical feeds URL-level dedup
  // (UrlCanon) and noindex is a hard pre-filter every crawl pipeline
  // honors. Each field is ONE anchored case-insensitive regex over
  // the raw page (narrow projection, codegen'd, no shuffle); the
  // same pattern constants drive both engine faces (Java regex and
  // DuckDB RE2 agree on these constructs, and both return '' for a
  // no-match group — pinned by the missing-description fixture rows).

  private val TitleRe = "(?i)<title[^>]*>([^<]*)</title>"
  private val DescRe = "(?i)<meta\\s+name=\"description\"\\s+content=\"([^\"]*)\""
  private val CanonRe = "(?i)<link\\s+rel=\"canonical\"\\s+href=\"([^\"]*)\""
  private val NoindexRe = "(?i)<meta\\s+name=\"robots\"\\s+content=\"[^\"]*noindex"

  def metaTitleCol(html: Column): Column =
    trim(regexp_extract(html, TitleRe, 1))
  def metaDescriptionCol(html: Column): Column =
    regexp_extract(html, DescRe, 1)
  def canonicalLinkCol(html: Column): Column =
    regexp_extract(html, CanonRe, 1)
  def noindexCol(html: Column): Column = html.rlike(NoindexRe)

  def metaTitleSql(html: String): String =
    s"trim(regexp_extract($html, '$TitleRe', 1))"
  def metaDescriptionSql(html: String): String =
    s"regexp_extract($html, '$DescRe', 1)"
  def canonicalLinkSql(html: String): String =
    s"regexp_extract($html, '$CanonRe', 1)"
  def noindexSql(html: String): String =
    s"regexp_matches($html, '$NoindexRe')"
}
