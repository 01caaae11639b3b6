package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token
  * counting, quality scoring, heuristic language ID, and document
  * fingerprinting. Column + SQL twins (the SQL twin is the DuckDB
  * oracle); formulas use only rational arithmetic on integers so both
  * engines produce bit-identical doubles.
  */
object TextStats {

  /** BPE-ish tokenization regex: letter runs, digit runs, single
    * non-space symbols. Identical semantics in Java regex and RE2.
    */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  val WsTokenRegex = "\\S+"
  val PunctRegex = "[^A-Za-z0-9\\s]"
  val DigitRegex = "[0-9]"
  val ArabicRegex = "[؀-ۿ]"
  val EnMarkerRegex = "\\bthe\\b"

  // ---- Column twins ------------------------------------------------------

  def tokenCountCol(c: Column): Column = regexp_count(c, lit(TokenRegex))
  def wsTokenCountCol(c: Column): Column = regexp_count(c, lit(WsTokenRegex))

  /** Quality score in [0,1]: length signal + punctuation and digit
    * penalties. Pure rational ops for cross-engine exactness.
    */
  def qualityScoreCol(c: Column): Column = {
    val words = wsTokenCountCol(c).cast("double")
    val chars = greatest(length(c), lit(1)).cast("double")
    val punct = regexp_count(c, lit(PunctRegex)).cast("double")
    val digits = regexp_count(c, lit(DigitRegex)).cast("double")
    round(
      least(words / 200.0, lit(1.0)) * 0.5 +
        (lit(1.0) - least(punct * 10.0 / chars, lit(1.0))) * 0.3 +
        (lit(1.0) - least(digits * 5.0 / chars, lit(1.0))) * 0.2,
      6)
  }

  /** Heuristic language ID: English marker word, else Arabic script,
    * else unknown (content-based n-gram heuristic baseline).
    */
  def langIdCol(c: Column): Column =
    when(regexp_count(c, lit(EnMarkerRegex)) > 0, "en")
      .when(regexp_count(c, lit(ArabicRegex)) > 0, "ar")
      .otherwise("unk")

  /** Rolling polynomial fingerprint of the first 64 chars:
    * h = fold(h*131 + codepoint) mod (2^31 - 1). Stable across
    * engines; used for cheap near-identity bucketing.
    */
  def fingerprintCol(c: Column): Column =
    aggregate(
      transform(split(substring(c, 1, 64), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, v) => (acc * 131L + v) % 2147483647L)

  // ---- SQL twins (DuckDB) -------------------------------------------------

  def tokenCountSql(e: String): String =
    s"CAST(len(regexp_extract_all($e, '$TokenRegex')) AS INT)"
  def wsTokenCountSql(e: String): String =
    s"CAST(len(regexp_extract_all($e, '\\S+')) AS INT)"

  def qualityScoreSql(e: String): String = {
    val words = s"CAST(len(regexp_extract_all($e, '\\S+')) AS DOUBLE)"
    val chars = s"CAST(greatest(length($e), 1) AS DOUBLE)"
    val punct = s"CAST(len(regexp_extract_all($e, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    val digits = s"CAST(len(regexp_extract_all($e, '[0-9]')) AS DOUBLE)"
    s"round(least($words / 200.0, 1.0) * 0.5 + (1.0 - least($punct * 10.0 / $chars, 1.0)) * 0.3 + " +
      s"(1.0 - least($digits * 5.0 / $chars, 1.0)) * 0.2, 6)"
  }

  def langIdSql(e: String): String =
    s"(CASE WHEN len(regexp_extract_all($e, '\\bthe\\b')) > 0 THEN 'en' " +
      s"WHEN len(regexp_extract_all($e, '[؀-ۿ]')) > 0 THEN 'ar' ELSE 'unk' END)"

  def fingerprintSql(e: String): String =
    // [\s\S], not '.': RE2's '.' skips newlines, but the Spark twin's
    // split-by-"" enumerates them — a '\n' in the first 64 chars must
    // hash identically on both sides
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      raw"list_transform(regexp_extract_all(substr($e, 1, 64), '[\s\S]'), ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(a, b) -> (a * 131 + b) % 2147483647)"
}
