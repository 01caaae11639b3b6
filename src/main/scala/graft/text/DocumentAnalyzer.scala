package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document-type analysis — A9..A12 in SURVEY.md §2.5, reimplementing
  * analyze_document_type (scripts/all-pdf-to-json-smart-structured.py:267-322,
  * duplicated at all-pdf-to-json-structured.py:115-144):
  *
  *   - per-category keyword counts over 5 ordered legal-term lists
  *     (non-overlapping substring counts, Python str.count);
  *   - detected type = the FIRST category (in list order) achieving the
  *     strictly-largest count ("count > max_count" with max_count
  *     starting at 0 => all-zero counts -> "Unknown");
  *   - confidence = min(max_count / 10, 1.0)  (:308);
  *   - article_count = #matches of `مادة\s*\d+`  (:310-312);
  *   - contains_dates: `\d{4}/\d{1,2}/\d{1,2}|\d{4}هـ|\d{4}\s*م` (:315);
  *   - key_patterns: first 5 '.'-split parts, stripped, kept if
  *     length > 10, truncated to 100 chars (:318-320).
  *
  * Scala / Column / SQL twins share the term tables.
  */
object DocumentAnalyzer {

  /** Ordered categories (dict iteration order in the reference, :283-289). */
  val Categories: Seq[(String, Seq[String])] = Seq(
    "regulation" -> Seq("نظام", "لائحة", "قانون", "تنظيم"),
    "court_ruling" -> Seq("حكم", "قرار", "محكمة", "قضية", "دعوى"),
    "contract" -> Seq("عقد", "اتفاقية", "مقاولة", "شراكة"),
    "law_article" -> Seq("مادة", "فقرة", "بند", "فصل"),
    "judicial_collection" -> Seq("مجموعة", "أحكام", "قضائية", "سابقة")
  )

  /** Digit class for the article/date patterns. The reference's Python
    * `\d` matches Arabic-Indic digits (U+0660-U+0669) as well as ASCII,
    * but Java/RE2 `\d` is ASCII-only — so the class is spelled out
    * explicitly, giving identical semantics in Java regex, RE2 (DuckDB)
    * and the reference (smart-structured.py:311,315).
    */
  val DigitCls = "[0-9٠-٩]"
  val ArticleRegex = s"مادة\\s*$DigitCls+"
  val DateRegex =
    s"$DigitCls{4}/$DigitCls{1,2}/$DigitCls{1,2}|$DigitCls{4}هـ|$DigitCls{4}\\s*م"

  final case class Analysis(
      documentType: String,
      confidence: Double,
      legalTermsFound: Seq[String],
      articleCount: Int,
      containsDates: Boolean,
      keyPatterns: Seq[String]
  )

  // ---- pure Scala twin --------------------------------------------------

  /** Python str.strip() on sentence parts: '.'-split parts can carry
    * \n/\t at their edges (page boundaries join with "\n\n"), which
    * Python strips — Spark's space-only trim() and Java's
    * control-char-eating String.trim both diverge, so all three twins
    * strip the \s class explicitly.
    */
  private def stripWs(s: String): String = {
    var a = 0
    var b = s.length
    @inline def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'
    while (a < b && ws(s.charAt(a))) a += 1
    while (b > a && ws(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** Non-overlapping substring count (Python str.count semantics). */
  def countOccurrences(haystack: String, needle: String): Int = {
    if (needle.isEmpty) return 0
    var n = 0
    var i = haystack.indexOf(needle)
    while (i >= 0) { n += 1; i = haystack.indexOf(needle, i + needle.length) }
    n
  }

  def analyze(text: String): Analysis = {
    // Locale.ROOT: the Column twin uses Spark's locale-independent
    // lower(); default-locale toLowerCase would diverge under tr-TR
    // (dotless-I) even though no fixture reaches it
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    var maxCount = 0
    var detected = "Unknown"
    val found = Seq.newBuilder[String]
    Categories.foreach { case (cat, terms) =>
      val count = terms.map(countOccurrences(lower, _)).sum
      if (count > maxCount) { maxCount = count; detected = cat }
      terms.foreach(t => if (lower.contains(t)) found += t)
    }
    val articleCount = ArticleRegex.r.findAllMatchIn(text).size
    val containsDates = DateRegex.r.findFirstIn(text).isDefined
    val keyPatterns = text.split("\\.", -1).take(5).toSeq
      .map(stripWs).filter(_.length > 10).map(_.take(100))
    Analysis(detected, math.min(maxCount / 10.0, 1.0), found.result(), articleCount, containsDates, keyPatterns)
  }

  // ---- Catalyst Column twins ---------------------------------------------

  /** Non-overlapping literal substring count as a Column expression. */
  def countCol(text: Column, term: String): Column =
    ((length(text) - length(call_function("replace", text, lit(term), lit("")))) / length(lit(term))).cast("int")

  def categoryCountCol(text: Column, terms: Seq[String]): Column =
    terms.map(countCol(text, _)).reduce(_ + _)

  /** (document_type, confidence) columns over pre-materialized count
    * columns `cnt_<category>` (see analyzeDf). Referencing columns —
    * not re-inlined count expressions — keeps the optimizer's
    * expression tree small; inlining the 21-term count trees into the
    * 3x-duplicated when-chain made planning quadratic.
    */
  def docTypeCols(cntCols: Seq[(String, Column)]): (Column, Column) = {
    val maxCount = greatest(cntCols.map(_._2): _*)
    val detected = cntCols.foldRight(lit("Unknown")) { case ((cat, cnt), els) =>
      when(cnt === maxCount, lit(cat)).otherwise(els)
    }
    // first category achieving the max: foldRight builds the when-chain
    // in order, so the earliest match wins; all-zero -> Unknown
    val typ = when(maxCount === 0, lit("Unknown")).otherwise(detected)
    val conf = least(maxCount.cast("double") / 10.0, lit(1.0))
    (typ, conf)
  }

  /** Full analysis projection keyed by `keyCol`: one native
    * single-pass count of all 21 terms (CountTermCategories), then
    * type/confidence derived from the per-category count column.
    */
  def analyzeDf(df: org.apache.spark.sql.DataFrame, lowered: Column, keyCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    // materialize the (possibly expensive) lowered expression ONCE,
    // then all 21 term counts in ONE allocation-free generated call
    // (the replace-diff Column twin, categoryCountCol, stays as the
    // property-tested reference form)
    val base = df.select(col(keyCol), lowered.as("lowered_txt"))
    val tc = ColumnBridge.column(graft.functions.CountTermCategories(
      ColumnBridge.expression(col("lowered_txt")), Categories.map(_._2)))
    val withTc = base.select(col(keyCol), tc.as("tc"))
    val withCounts = withTc.select(col(keyCol) +: Categories.zipWithIndex.map {
      case ((cat, _), i) => element_at(col("tc"), i + 1).as(s"cnt_$cat")
    }: _*)
    val cntCols = Categories.map { case (cat, _) => cat -> col(s"cnt_$cat") }
    val (typ, conf) = docTypeCols(cntCols)
    withCounts.select(col(keyCol), typ.as("document_type"), conf.as("confidence"))
  }

  def articleCountCol(text: Column): Column = regexp_count(text, lit(ArticleRegex))

  def containsDatesCol(text: Column): Column = text.rlike(DateRegex)

  def keyPatternsCol(text: Column): Column =
    transform(
      filter(
        // \s-strip, not trim(): parts carry \n at page boundaries
        transform(slice(split(text, "\\.", -1), 1, 5),
          s => regexp_replace(s, "^\\s+|\\s+$", "")),
        s => length(s) > 10),
      s => substring(s, 1, 100))

  // ---- SQL text twins (DuckDB) --------------------------------------------

  import ArabicNormalizer.sqlLit

  def countSql(expr: String, term: String): String =
    s"CAST((length($expr) - length(replace($expr, ${sqlLit(term)}, ''))) / ${term.length} AS INT)"

  def categoryCountSql(expr: String, terms: Seq[String]): String =
    terms.map(countSql(expr, _)).mkString("(", " + ", ")")

  /** SQL for (document_type, confidence); pass a lowercased expr. */
  def docTypeSql(lower: String): (String, String) = {
    val counts = Categories.map { case (cat, terms) => cat -> categoryCountSql(lower, terms) }
    val maxExpr = counts.map(_._2).mkString("greatest(", ", ", ")")
    val chain = counts.map { case (cat, cnt) => s"WHEN $cnt = m THEN ${sqlLit(cat)}" }.mkString(" ")
    val typ = s"(CASE WHEN m = 0 THEN 'Unknown' $chain ELSE 'Unknown' END)"
    val conf = "least(m / 10.0, 1.0)"
    // callers must alias maxExpr as m in a lateral/subquery
    (typ, conf)
  }

  def maxCountSql(lower: String): String =
    Categories.map { case (_, terms) => categoryCountSql(lower, terms) }
      .mkString("greatest(", ", ", ")")

  def articleCountSql(expr: String): String =
    s"CAST(len(regexp_extract_all($expr, ${sqlLit(ArticleRegex)})) AS INT)"

  def containsDatesSql(expr: String): String =
    s"regexp_matches($expr, ${sqlLit(DateRegex)})"
}
