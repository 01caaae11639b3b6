package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer (round-5 verdict #5).
  *
  * Every token budget in a real training-data pipeline — chunk sizes,
  * packing bins, context-window fill — is counted in SUBWORD tokens,
  * not whitespace words. This is a from-scratch BPE face with the two
  * properties the rest of this repo demands of every operator:
  * deterministic end to end, and restatable verbatim in DuckDB so the
  * tokenization itself is oracle-checkable.
  *
  * TRAINING (classic Sennrich-style, driver-side): start from
  * characters, repeatedly take the most frequent adjacent pair (ties
  * broken lexicographically — a FIXED total order, so training is
  * reproducible bit-for-bit), merge it greedily left-to-right
  * everywhere, repeat. Trained once over `SeedWords` — the driver
  * corpus's closed 31-word vocabulary (TESTDATA.md; identical at
  * every scale factor), embedded as a literal so the merge table is a
  * pure function of repo code, never of the data being tokenized. The
  * production analogue is exactly this shape: vocabularies are trained
  * on a fixed reference sample, frozen, and applied corpus-wide (the
  * KMeansSampleCap rationale — nobody trains a tokenizer over 100 TB).
  *
  * APPLICATION — the cross-engine trick: a token list is encoded as a
  * single string with every token ENCLOSED as U+001F<tok>U+001E.
  * Applying merge (a, b) -> ab is then literally
  * `replace(s, "<a><b>", "<ab>")`:
  * plain string replace is left-to-right NON-OVERLAPPING — exactly
  * BPE's greedy single-merge pass ("aaa" + (a,a) -> [aa, a]) — and the
  * full enclosure makes a match spanning a previously-merged token
  * impossible ("aa" never matches "a"). The
  * whole tokenizer is therefore M chained `replace` calls — identical
  * semantics, byte for byte, in Spark (codegen'd StringReplace, no
  * UDF) and DuckDB (the oracle SQL is GENERATED from the same trained
  * merge table, the round-3 single-source rule). Merges never cross
  * words: pairs touching a whitespace token are excluded at training,
  * and a merged token is the only way adjacency changes.
  *
  * Scale shape: a narrow per-row projection — no shuffle, no state;
  * the encoded intermediate is ~3x the text length and M replace
  * passes are O(M * len) per row.
  */
object BpeTokenizer {

  /** Token enclosure markers — control chars no corpus text uses (a
    * raw U+001F in input would inflate that doc's count by one per
    * occurrence; acceptable for text corpora, documented here).
    */
  val Open = "\u001f"
  val Close = "\u001e"

  /** The driver documents vocabulary (TESTDATA.md): closed, 31 words,
    * identical at sf0.001/0.01/0.1 — the fixed training sample.
    */
  val SeedWords: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  val NMerges = 40

  /** The frozen merge table: trained once per JVM, pure function of
    * (SeedWords, NMerges).
    */
  lazy val Merges: Seq[(String, String)] = trainMerges(SeedWords.map(_ -> 1L), NMerges)

  /** One greedy left-to-right non-overlapping merge pass — the Scala
    * twin of the enclosed-string replace (pinned equal in BpeSpec).
    */
  def applyMergeOnce(toks: Vector[String], m: (String, String)): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == m._1 && toks(i + 1) == m._2) {
        b += (m._1 + m._2); i += 2
      } else { b += toks(i); i += 1 }
    }
    b.result()
  }

  /** Reference tokenizer: chars -> all merges in training order, one
    * greedy pass each (the same M passes the column/SQL faces run).
    */
  def tokenize(text: String): Vector[String] =
    Merges.foldLeft(text.map(_.toString).toVector)(applyMergeOnce)

  /** Deterministic BPE training. Pair counts exclude any pair touching
    * a whitespace token (merges must never cross words); argmax tie
    * rule is (count desc, a asc, b asc) — total, so training order is
    * unique. Stops early when no pair repeats.
    */
  def trainMerges(wordFreq: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var seqs: Seq[(Vector[String], Long)] =
      wordFreq.sortBy(_._1).map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((toks, c) <- seqs; i <- 0 until toks.length - 1
           if !toks(i).exists(_.isWhitespace) && !toks(i + 1).exists(_.isWhitespace)) {
        val p = (toks(i), toks(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        seqs = seqs.map { case (t, c) => (applyMergeOnce(t, best), c) }
        k += 1
      }
    }
    out.result()
  }

  // ---- Spark face (pure codegen'd string expressions, no UDF) -----------

  /** Enclosed encoding of the FINAL tokenization: per-char enclosure,
    * then the M merge replaces in training order.
    */
  def encodeCol(text: Column): Column =
    Merges.foldLeft(
      regexp_replace(text, "(?s)(.)", Open + "$1" + Close)) { case (s, (a, b)) =>
      call_function("replace", s, lit(Open + a + Close + Open + b + Close),
        lit(Open + a + b + Close))
    }

  /** Space-joined token string from an encoded column. */
  def tokensFromEncCol(enc: Column): Column =
    call_function("replace",
      call_function("replace",
        call_function("replace", enc, lit(Close + Open), lit(" ")),
        lit(Open), lit("")),
      lit(Close), lit(""))

  /** Token count from an encoded column: one Open marker per token. */
  def countFromEncCol(enc: Column): Column =
    (length(enc) - length(call_function("replace", enc, lit(Open), lit(""))))
      .cast("long")

  // ---- DuckDB face (generated from the SAME merge table) ----------------

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** SQL twin of encodeCol over expression `e`. */
  def encodeSql(e: String): String =
    Merges.foldLeft(s"regexp_replace($e, '(.)', chr(31) || '\\1' || chr(30), 'gs')") {
      case (s, (a, b)) =>
        s"replace($s, ${q(Open + a + Close + Open + b + Close)}, ${q(Open + a + b + Close)})"
    }

  def tokensFromEncSql(enc: String): String =
    s"replace(replace(replace($enc, ${q(Close + Open)}, ' '), ${q(Open)}, ''), ${q(Close)}, '')"

  def countFromEncSql(enc: String): String =
    s"(length($enc) - length(replace($enc, ${q(Open)}, '')))"
}
