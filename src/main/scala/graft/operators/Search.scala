package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus keyword search: Okapi BM25 ranking over the documents table.
  *
  * The training-data use case is retrieval-based corpus curation
  * (find the docs most relevant to a probe query — contamination
  * checks, topical subset extraction), so the operator is built
  * scale-first:
  *
  *  - per-doc pass: ONE narrow projection computes doc length and the
  *    token-exact tf vector for the query terms (native single-pass
  *    TokenTermFreqs kernel — no explode, no per-term HOF scans);
  *  - corpus statistics (N, avgdl, per-term df) reduce to ONE row via
  *    partial aggregation (map-side combine), then ride back on a
  *    broadcast nested-loop join — no shuffle of the corpus;
  *  - the top-k is orderBy+limit, which Spark plans as TakeOrdered
  *    (per-partition heaps, no global sort materialization).
  *
  * All inputs to the score are integers (tf, df, dl, N exact; avgdl =
  * exact integer sum / exact count), so both engines evaluate the same
  * double expression tree and round(score, 6) compares exactly across
  * engines (the ln/log1p ulp caveat is shared with every rounded
  * double oracle in this repo).
  */
object Search {

  /** Okapi BM25 with the Lucene-style smoothed idf
    * ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive, so scores
    * are monotone in matched terms. `terms` must be lowercase (the
    * token stream is lowercased like every dedup path).
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(terms.nonEmpty && terms.forall(t => t == t.toLowerCase),
      "query terms must be nonempty and lowercase")
    val m = terms.length
    val tfCol = ColumnBridge.column(graft.functions.TokenTermFreqs(
      ColumnBridge.expression(Dedup.wordSeqCol(col("text"))), terms))
    val base = docs.select(col("doc_id"),
      size(Dedup.wordSeqCol(col("text"))).as("dl"), tfCol.as("tf"))
    // avgdl as explicit exact-long-sum / count on BOTH engines (not
    // avg): engine-native avg may accumulate in double, and an ulp
    // difference in avgdl can flip a round(score,6) knife edge or the
    // top-k cutoff at larger corpora (round-4 advice)
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"),
      array((0 until m).map(i =>
        sum(when(col("tf")(i) > 0, 1L).otherwise(0L))): _*).as("df"))
    val score: Column = (0 until m).map { i =>
      val tf = col("tf")(i).cast("double")
      val df = col("df")(i).cast("double")
      val idf = log(lit(1.0) + (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** CCNet-style unigram language-model scoring: per-doc mean token
    * log-probability under the CORPUS's own unigram distribution —
    * low scores flag gibberish / out-of-distribution docs, the
    * cheap-LM quality filter curation pipelines run before the
    * expensive model-based one.
    *
    * Shape: one explode (map-side), one token-keyed aggregation for
    * the frequency table, the corpus total as a one-row broadcast,
    * then the occurrence->frequency join (AQE broadcasts the
    * vocabulary-sized side at runtime) feeding a doc-keyed mean. Token
    * counts are exact integers, so both engines evaluate identical
    * ln arguments.
    */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(Dedup.wordSeqCol(col("text"))).as("token"))
    // the frequency table is MATERIALIZED once (r07): it feeds both
    // the corpus-total aggregate and the occurrence join — the
    // un-materialized plan re-ran the corpus explode+agg for each
    // (3 full passes total; now 2: one for freq, one for the join)
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("nf"))
      .localCheckpoint(false)
    val total = freq.agg(sum(col("nf")).as("n_total"))
    tok.join(freq, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("nf").cast("double") / col("n_total").cast("double"))), 6)
          .as("avg_logprob"))
  }

  /** DuckDB oracle of unigramLogProb. */
  def unigramLogProbOracleSql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS token
       |  FROM documents),
       |freq AS (SELECT token, count(*) AS nf FROM tok GROUP BY token),
       |tot AS (SELECT sum(nf) AS n_total FROM freq)
       |SELECT t.doc_id, count(*) AS n_tokens,
       |  round(avg(ln(CAST(f.nf AS DOUBLE) / CAST(n_total AS DOUBLE))), 6) AS avg_logprob
       |FROM tok t JOIN freq f ON t.token = f.token, tot
       |GROUP BY t.doc_id""".stripMargin

  /** Bigram LM scoring — the order-sensitive sibling of
    * `unigramLogProb`: per-doc mean ln(c(ab)/c(a·)) under the corpus's
    * own bigram MLE (c(ab) = corpus count of the bigram, c(a·) = count
    * of bigrams starting with a — every observed bigram has c ≥ 1, so
    * no smoothing term is needed for the corpus's own docs). Low
    * scores flag scrambled/unnatural word order that unigram
    * frequency cannot see.
    *
    * Shape mirrors unigramLogProb: one bigram explode (zip_with over
    * two slices — both slice arguments sit OUTSIDE the lambda, so the
    * round-3 HOF re-evaluation trap does not apply), two token-keyed
    * aggregations, occurrence->frequency joins that AQE broadcasts at
    * vocabulary size, one doc-keyed mean. Exact integer counts both
    * engines.
    */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val w = docs.select(col("doc_id"), Dedup.wordSeqCol(col("text")).as("w"))
      .where(size(col("w")) >= 2)
    val pairs = w.select(col("doc_id"),
      explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    // bigram counts are the model's sufficient statistics: c(a·)
    // DERIVES from c(ab) (sum over b), so the corpus bigram explode
    // runs once for training instead of twice, and the model rides ONE
    // join back onto the occurrence stream instead of two (r07 — fab
    // is bigram-vocab-sized and materialized once)
    val fab = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .localCheckpoint(false)
    val fa = fab.groupBy(col("a")).agg(sum(col("cab")).as("ca"))
    val model = fab.join(fa, Seq("a"))
    pairs.join(model, Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("cab").cast("double") / col("ca").cast("double"))), 6)
          .as("avg_logprob"))
  }

  /** DuckDB oracle of bigramLogProb (parallel unnest zips the two
    * slices positionally).
    */
  def bigramLogProbOracleSql: String =
    s"""WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |sl AS (SELECT doc_id, w[1:len(w)-1] AS la, w[2:len(w)] AS lb FROM t WHERE len(w) >= 2),
       |z AS (SELECT doc_id, unnest(la) AS a, unnest(lb) AS b FROM sl),
       |fab AS (SELECT a, b, count(*) AS cab FROM z GROUP BY 1, 2),
       |fa AS (SELECT a, count(*) AS ca FROM z GROUP BY 1)
       |SELECT z.doc_id, count(*) AS n_bigrams,
       |  round(avg(ln(CAST(cab AS DOUBLE) / CAST(ca AS DOUBLE))), 6) AS avg_logprob
       |FROM z JOIN fab USING (a, b) JOIN fa USING (a)
       |GROUP BY z.doc_id""".stripMargin

  /** DuckDB oracle of bm25TopK (same constants; lists are 1-based). */
  def bm25OracleSql(terms: Seq[String], k: Int,
                    k1: Double = 1.2, b: Double = 0.75): String = {
    val m = terms.length
    def lit(t: String) = "'" + t.replace("'", "''") + "'"
    val tfList = terms.map(t => s"len(list_filter(w, x -> x = ${lit(t)}))").mkString(", ")
    val dfList = (1 to m).map(i => s"sum(CASE WHEN tf[$i] > 0 THEN 1 ELSE 0 END)").mkString(", ")
    val scoreTerms = (1 to m).map { i =>
      s"""(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df[$i] AS DOUBLE) + 0.5) / (CAST(df[$i] AS DOUBLE) + 0.5))
         | * (CAST(tf[$i] AS DOUBLE) * ${k1 + 1.0})
         | / (CAST(tf[$i] AS DOUBLE) + $k1 * (${1.0 - b} + $b * CAST(dl AS DOUBLE) / avgdl)))""".stripMargin
    }.mkString(" + ")
    s"""WITH w AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |base AS (SELECT doc_id, len(w) AS dl, [$tfList] AS tf FROM w),
       |stats AS (SELECT count(*) AS n_docs,
       |    CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl, [$dfList] AS df FROM base),
       |scored AS (SELECT doc_id, round($scoreTerms, 6) AS score FROM base, stats)
       |SELECT doc_id, score FROM scored WHERE score > 0
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }
}
