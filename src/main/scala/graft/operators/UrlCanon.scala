package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the first dedup any web
  * corpus runs (before any content hashing): the same page is crawled
  * under scheme/host case variants, default ports, www aliases,
  * tracking parameters and fragments, and collapsing those BEFORE
  * fetch/extraction is orders of magnitude cheaper than content-level
  * dedup after. Canonical form here: lowercase scheme+host, default
  * port stripped, leading www. stripped, utm_* tracking params and
  * fragments removed, trailing slash trimmed — paths and meaningful
  * query params are case/content-preserved (RFC 3986: only scheme and
  * host are case-insensitive).
  *
  * Every step is one anchored/codegen'd regexp over the URL column —
  * a narrow projection with no shuffle; the dedup itself is one hash
  * aggregation on the canonical string. The same regex constants
  * drive both engine faces; only the backreference token differs
  * (Java `$1` vs DuckDB RE2 `\\1`), which is why each replacement is
  * declared once here as a (pattern, sparkRepl, duckRepl) triple.
  */
object UrlCanon {

  /** (pattern, Spark replacement, DuckDB replacement), applied in
    * order. Fragment first (so later patterns never see it), then
    * tracking params, then the dangling separator they leave, then
    * host-case/port/www surgery, then the trailing slash.
    */
  val Steps: Seq[(String, String, String)] = Seq(
    ("#.*$", "", ""),
    ("utm_[a-z]+=[^&#]*&?", "", ""),
    ("[?&]+$", "", ""),
    ("^(https?://[^/:?#]+):(?:80|443)([/?#]|$)", "$1$2", "\\1\\2"),
    ("^(https?://)www\\.", "$1", "\\1"),
    ("/$", "", ""))

  private val HostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  /** Canonical URL (Spark face): lowercase the scheme://host prefix,
    * then apply [[Steps]] in order.
    */
  def canonicalCol(url: Column): Column = {
    val lowered = concat(lower(regexp_extract(url, HostRe, 0)),
      regexp_replace(url, HostRe, ""))
    Steps.foldLeft(lowered) { case (u, (pat, repl, _)) => regexp_replace(u, pat, repl) }
  }

  /** DuckDB twin of [[canonicalCol]]. Spark's regexp_replace is
    * replace-all; the 'g' flag keeps DuckDB identical (load-bearing
    * for the multi-utm case).
    */
  def canonicalSql(urlExpr: String): String = {
    val lowered = s"lower(regexp_extract($urlExpr, '$HostRe')) || " +
      s"regexp_replace($urlExpr, '$HostRe', '')"
    Steps.foldLeft(lowered) { case (u, (pat, _, repl)) =>
      s"regexp_replace($u, '$pat', '$repl', 'g')"
    }
  }

  // ---- fixture: four crawl-variant URLs per document ---------------------

  /** Synthetic crawl URL for a doc: doc_id % 4 picks the variant
    * family, doc_id % 37 the page. Variants 0-2 canonicalize to the
    * same URL (case+port, www+tracking); variant 3 keeps a REAL query
    * param after the utm strip and must stay distinct — the fixture
    * checks the filter collapses exactly what it should and nothing
    * more.
    */
  def urlCol(docId: Column): Column = {
    val k = (docId % 37).cast("string")
    val v = docId % 4
    when(v === 0, concat(lit("https://example.com/articles/"), k))
      .when(v === 1, concat(lit("HTTPS://EXAMPLE.COM:443/articles/"), k, lit("/")))
      .when(v === 2, concat(lit("https://www.example.com/articles/"), k,
        lit("?utm_source=feed&utm_campaign=x")))
      .otherwise(concat(lit("https://example.com/articles/"), k,
        lit("?id=7&utm_medium=a#section-2")))
  }

  /** DuckDB twin of [[urlCol]]. */
  def urlSql(docIdExpr: String): String = {
    val k = s"CAST($docIdExpr % 37 AS VARCHAR)"
    s"""CASE $docIdExpr % 4
       |  WHEN 0 THEN 'https://example.com/articles/' || $k
       |  WHEN 1 THEN 'HTTPS://EXAMPLE.COM:443/articles/' || $k || '/'
       |  WHEN 2 THEN 'https://www.example.com/articles/' || $k || '?utm_source=feed&utm_campaign=x'
       |  ELSE 'https://example.com/articles/' || $k || '?id=7&utm_medium=a#section-2'
       |END""".stripMargin
  }
}
