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
    */
  def mainContentCol(html: Column, minTokens: Int = 4,
                     maxLinkDensity: Double = 0.2): Column = {
    def stripped(b: Column): Column = regexp_replace(b, InlineTagRe, " ")
    def nTokens(b: Column): Column =
      size(filter(split(stripped(b), "\\s+"), x => x =!= ""))
    val blocks = split(html, BlockTagRe)
    val kept = filter(blocks, b =>
      nTokens(b) >= minTokens &&
        regexp_count(b, lit(AnchorRe)).cast("double") <=
          lit(maxLinkDensity) * nTokens(b).cast("double"))
    trim(regexp_replace(concat_ws(" ", transform(kept, b => stripped(b))), "\\s+", " "))
  }

  /** DuckDB twin of mainContentCol over an HTML expression (the 'g'
    * flags are load-bearing: DuckDB regexp_replace is first-match-only
    * by default where Spark's replaces all).
    */
  def mainContentSql(htmlExpr: String, minTokens: Int = 4,
                     maxLinkDensity: Double = 0.2): String = {
    def stripped(b: String) = s"regexp_replace($b, '$InlineTagRe', ' ', 'g')"
    def nTokens(b: String) =
      s"len(list_filter(regexp_split_to_array(${stripped(b)}, '\\s+'), x -> x <> ''))"
    s"""trim(regexp_replace(array_to_string(list_transform(
       |  list_filter(regexp_split_to_array($htmlExpr, '$BlockTagRe'),
       |    b -> ${nTokens("b")} >= $minTokens
       |      AND CAST(len(regexp_extract_all(b, '$AnchorRe')) AS DOUBLE)
       |          <= $maxLinkDensity * CAST(${nTokens("b")} AS DOUBLE)),
       |  b -> ${stripped("b")}), ' '), '\\s+', ' ', 'g'))""".stripMargin
  }
}
