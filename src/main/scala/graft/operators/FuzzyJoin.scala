package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FUZZY (edit-distance) SIMILARITY JOIN — record linkage at corpus
  * scale: match dirty strings (OCR'd titles, crawl-variant anchors,
  * user-typed names) to their canonical forms under
  * `levenshtein(a, b) <= d` without the all-pairs Levenshtein that a
  * naive `JOIN ... ON levenshtein(...) <= d` predicate plans (a
  * nested-loop over |L| x |R| — the same trap as the BETWEEN range
  * join, solved the same way: manufacture an equi-key).
  *
  * Candidate generation is the LOSSLESS positional q-gram filter of
  * Gravano et al., "Approximate String Joins in a Database (Almost)
  * for Free" (VLDB 2001):
  *
  *   - LENGTH filter: edit distance <= d implies ||a|-|b|| <= d.
  *   - COUNT filter: strings within distance d share at least
  *     `max(|a|,|b|) - q + 1 - d*q` positional q-grams whose
  *     positions differ by at most d (each edit destroys at most q
  *     grams and shifts the rest by at most d).
  *
  * The position constraint |pos_a - pos_b| <= d becomes an equi-key
  * by bucketing positions at width d+1 and exploding the LEFT gram
  * into its bucket +-1 (the [[RangeJoin]] expansion): every in-range
  * pair meets in exactly the right bucket set, so the join is a plain
  * hash join on (gram, bucket) and the count filter is one
  * grouped aggregation over its matches. Hot grams are split across
  * position buckets by construction, which is what keeps the join
  * key selective even on low-entropy alphabets.
  *
  * SHORT strings are the documented hole in the count filter: when
  * `max(|a|,|b|) <= q + d*q - 1` the threshold is <= 0 and a true
  * pair may share NO q-gram at all, so pairs that short are routed
  * through a length-bucket equi-join instead (bucket width d+1, +-1
  * expansion — sound because of the length filter). The two branches
  * partition the pair space on `max(|a|,|b|) > q + d*q - 1`, so the
  * union is duplicate-free without a distinct shuffle. Survivors of
  * either branch are verified with the exact `levenshtein` (codegen'd
  * built-in), which is why the whole construction is LOSSLESS: the
  * output is bit-identical to the brute-force predicate join (fuzzed
  * against brute force in FuzzyJoinSpec, incl. empty/short strings).
  *
  * At 100 TB: gram explosion is a narrow projection (|s|-q+1 rows of
  * (gram, pos, id, len) per string, left side x3 for the bucket
  * expansion); the only shuffles are the (gram, bucket) hash join,
  * the per-pair count aggregation, and the two id-keyed string
  * fetch-backs — all equi-keyed, AQE-splittable, and sized by
  * CANDIDATE volume (pairs sharing aligned grams), never |L| x |R|.
  * Null strings on either side are dropped (no match semantics).
  */
object FuzzyJoin {

  /** Inner fuzzy join: rows (l_id, r_id, dist) for every pair with
    * `levenshtein(lS, rS) <= d`, exactly. `q` is the gram width
    * (2 or 3 typical; larger q = fewer, more selective grams but a
    * wider short-string pool).
    */
  def fuzzyJoin(left: DataFrame, lId: String, lS: String,
                right: DataFrame, rId: String, rS: String,
                d: Int, q: Int): DataFrame = {
    require(d >= 1, "edit-distance bound d must be >= 1")
    require(q >= 2, "gram width q must be >= 2")
    val w = d + 1                 // position/length bucket width
    val shortMax = q + d * q - 1  // count-filter threshold <= 0 at or below

    // both sides are MATERIALIZED once (r07): each is consumed twice
    // (gram/short candidate generation + the verify fetch-back), and
    // the un-materialized plan re-evaluated the upstream string
    // derivation for every consumer — for expression-derived inputs
    // (the fixture's canonical/dirty columns) that is the dominant
    // per-pass CPU. Slim tables: (id, string, length).
    val l = left.where(col(lS).isNotNull)
      .select(col(lId).as("l_id"), col(lS).as("l_s"),
        length(col(lS)).as("l_len"))
      .localCheckpoint(false)
    val r = right.where(col(rS).isNotNull)
      .select(col(rId).as("r_id"), col(rS).as("r_s"),
        length(col(rS)).as("r_len"))
      .localCheckpoint(false)

    def grams(df: DataFrame, id: String, s: String, len: String,
              pos: String) =
      df.where(col(len) >= q)
        .select(col(id), col(len),
          posexplode(transform(sequence(lit(0), col(len) - q),
            i => col(s).substr(i + 1, lit(q)))).as(Seq(pos, "gram")))

    // left explodes into bucket +-1 so |l_pos - r_pos| <= d pairs meet
    val lg = grams(l, "l_id", "l_s", "l_len", "l_pos")
      .withColumn("lb", (col("l_pos") / w).cast("long"))
      .withColumn("bkt", explode(array(col("lb") - 1, col("lb"), col("lb") + 1)))
      .drop("lb")
    val rg = grams(r, "r_id", "r_s", "r_len", "r_pos")
      .withColumn("bkt", (col("r_pos") / w).cast("long"))

    val gramCands = lg.join(rg, Seq("gram", "bkt"))
      .where(abs(col("l_pos") - col("r_pos")) <= d &&
        abs(col("l_len") - col("r_len")) <= d &&
        greatest(col("l_len"), col("r_len")) > shortMax)
      .groupBy(col("l_id"), col("r_id"), col("l_len"), col("r_len"))
      .agg(count(lit(1)).as("m"))
      // count(*) over occurrence pairs >= the 1-1 positional match
      // count, so keeping m >= threshold admits every true pair
      .where(col("m") >=
        greatest(col("l_len"), col("r_len")) - lit(q - 1) - lit(d * q))
      .select(col("l_id"), col("r_id"))

    // short branch: both sides <= shortMax (implied by the length
    // filter when max(len) <= shortMax), length-bucket equi-join
    val ls = l.where(col("l_len") <= shortMax)
      .withColumn("lb", (col("l_len") / w).cast("long"))
      .withColumn("bkt", explode(array(col("lb") - 1, col("lb"), col("lb") + 1)))
      .select(col("l_id"), col("l_len"), col("bkt"))
    val rs = r.where(col("r_len") <= shortMax)
      .withColumn("bkt", (col("r_len") / w).cast("long"))
      .select(col("r_id"), col("r_len"), col("bkt"))
    val shortCands = ls.join(rs, Seq("bkt"))
      .where(abs(col("l_len") - col("r_len")) <= d &&
        greatest(col("l_len"), col("r_len")) <= shortMax)
      .select(col("l_id"), col("r_id"))

    gramCands.union(shortCands)
      .join(l.select(col("l_id"), col("l_s")), Seq("l_id"))
      .join(r.select(col("r_id"), col("r_s")), Seq("r_id"))
      .select(col("l_id"), col("r_id"),
        levenshtein(col("l_s"), col("r_s")).cast("long").as("dist"))
      .where(col("dist") <= d)
      .select(col("l_id"), col("r_id"), col("dist"))
  }

  // ---- deterministic record-linkage fixture (testdata is uniform,
  // so dirty/canonical string pairs are DERIVED from doc_id: a
  // 12-char base-26 encoding of two integer LCG hashes gives
  // high-entropy canonical strings, and a deterministic single edit
  // (replace/delete/insert by doc_id % 3) gives the dirty side — all
  // integer/substring arithmetic, restated verbatim in DuckDB).

  private val Alpha = "abcdefghijklmnopqrstuvwxyz"
  private val M = 308915776L // 26^6

  private def b26(h: Column): Column =
    concat((5 to 0 by -1).map { i =>
      val p = math.pow(26, i).toLong
      lit(Alpha).substr((pmod((h / p).cast("long"), lit(26L)) + 1).cast("int"), lit(1))
    }: _*)

  private def b26Sql(h: String): String =
    (5 to 0 by -1).map { i =>
      val p = math.pow(26, i).toLong
      s"substring('$Alpha', CAST((($h // $p) % 26) + 1 AS INT), 1)"
    }.mkString(" || ")

  /** 12-char canonical string for an integer id. */
  def canonicalCol(id: Column): Column = {
    val h1 = pmod(id * 1103515245L + 12345L, lit(M))
    val h2 = pmod(id * 69069L + 1L, lit(M))
    concat(b26(h1), b26(h2))
  }

  def canonicalSql(id: String): String = {
    val h1 = s"((($id) * 1103515245 + 12345) % $M)"
    val h2 = s"((($id) * 69069 + 1) % $M)"
    s"${b26Sql(h1)} || ${b26Sql(h2)}"
  }

  /** Canonical string with ONE deterministic edit at position
    * `id % 11 + 1`: replace (id%3=0), delete (=1), or insert (=2).
    */
  def dirtyCol(id: Column): Column = {
    val s = canonicalCol(id)
    val pos = pmod(id, lit(11L)).cast("int") + 1
    val sub = lit(Alpha).substr((pmod(id, lit(26L)) + 1).cast("int"), lit(1))
    val mode = pmod(id, lit(3L))
    when(mode === 0,
        concat(s.substr(lit(1), pos - 1), sub, s.substr(pos + 1, lit(12) - pos)))
      .when(mode === 1,
        concat(s.substr(lit(1), pos - 1), s.substr(pos + 1, lit(12) - pos)))
      .otherwise(
        concat(s.substr(lit(1), pos), lit("q"), s.substr(pos + 1, lit(12) - pos)))
  }

  def dirtySql(id: String): String = {
    val s = s"(${canonicalSql(id)})"
    val pos = s"(CAST(($id) % 11 AS INT) + 1)"
    val sub = s"substring('$Alpha', CAST((($id) % 26) + 1 AS INT), 1)"
    s"""CASE ($id) % 3
       |  WHEN 0 THEN substring($s, 1, $pos - 1) || $sub || substring($s, $pos + 1, 12 - $pos)
       |  WHEN 1 THEN substring($s, 1, $pos - 1) || substring($s, $pos + 1, 12 - $pos)
       |  ELSE substring($s, 1, $pos) || 'q' || substring($s, $pos + 1, 12 - $pos)
       |END""".stripMargin
  }
}
