package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained model-based classification as PURE dataflow — multinomial
  * Naive Bayes with Laplace smoothing, trained on the corpus's own
  * (label, token) counts and applied back to every document in the
  * same declarative plan. This is the "model-based quality/language
  * filter" step of a training-data pipeline (the tier above the
  * heuristic signals in TextStats): the model IS an aggregation, so
  * unlike gradient-trained filters the whole train+score loop is
  * exactly restatable in SQL and oracle-checked end to end — and the
  * same shape scores any broadcast-size table of per-class log-probs,
  * however it was trained.
  *
  * Scale shape: training is ONE hash aggregation over exploded
  * (label, token) pairs (map-side combined; vocab x classes is the
  * model size — small by definition or NB is the wrong tool).
  * Scoring joins each document token against the BROADCAST model
  * (classes x token rows, pipelined in the scan stage), then one
  * (doc_id, class) aggregation and a per-doc argmax window over
  * |classes| rows. No OOV path is needed when scoring the training
  * corpus itself (every token is in the vocab by construction);
  * scoring fresh data adds one coalesce to the smoothing floor.
  *
  * Determinism: per-class scores are rounded to 6 decimals BEFORE
  * the argmax on both engines and ties break on the class name, so
  * float summation order cannot flip the winner (the BM25 ulp lesson
  * applied at design time).
  */
object NaiveBayes {

  /** Train on (lang, text), classify every doc. Output:
    * (doc_id, lang, pred_lang, hit) — hit = 1 iff the argmax class
    * equals the training label.
    */
  def langClassify(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("tok"))
    // (lang, tok) counts are the model's sufficient statistics: tot,
    // voc and vn all DERIVE from them (sum over toks per lang == token
    // count per lang; distinct toks == vocab), so the exploded corpus
    // pass runs once for training — the un-materialized form re-ran
    // the explode for each of the four consumers (r07). `cnt` is
    // model-sized (vocab x classes) by NB's own applicability
    // assumption; blocks reclaimed per-query by Bench/Verify.
    val cnt = toks.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val tot = cnt.groupBy("lang").agg(sum(col("c")).as("t"))
    val voc = cnt.select("tok").distinct()
    val vn = voc.agg(count(lit(1)).as("v"))
    val pri = docs.groupBy("lang").agg(count(lit(1)).as("d"))
    val nn = docs.agg(count(lit(1)).as("n"))
    val model = voc.crossJoin(pri.select("lang")).crossJoin(vn)
      .join(tot, Seq("lang"))
      .join(cnt, Seq("lang", "tok"), "left")
      .select(col("lang"), col("tok"),
        log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (col("t") + col("v")).cast("double")).as("logp"))
    val sc = toks.select(col("doc_id"), col("tok"))
      .join(broadcast(model), Seq("tok"))
      .groupBy(col("doc_id"), col("lang").as("cls"))
      .agg(sum(col("logp")).as("s"))
    val scored = sc.join(broadcast(pri.withColumnRenamed("lang", "cls")), Seq("cls"))
      .crossJoin(broadcast(nn))
      .select(col("doc_id"), col("cls"),
        round(col("s") + log(col("d").cast("double") / col("n").cast("double")), 6).as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cls"))
    scored.withColumn("r", row_number().over(w)).where(col("r") === 1)
      .select(col("doc_id"), col("cls").as("pred_lang"))
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        (col("lang") === col("pred_lang")).cast("int").as("hit"))
  }

  /** DuckDB twin of [[langClassify]] over `documents`. */
  def langClassifyOracleSql: String =
    s"""WITH tok AS (SELECT doc_id, lang,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS tok
       |  FROM documents),
       |cnt AS (SELECT lang, tok, count(*) AS c FROM tok GROUP BY 1, 2),
       |tot AS (SELECT lang, count(*) AS t FROM tok GROUP BY 1),
       |voc AS (SELECT DISTINCT tok FROM tok),
       |vn AS (SELECT count(*) AS v FROM voc),
       |pri AS (SELECT lang, count(*) AS d FROM documents GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM documents),
       |model AS (SELECT p.lang, voc.tok,
       |    ln((coalesce(c.c, 0) + 1.0) / CAST(tot.t + vn.v AS DOUBLE)) AS logp
       |  FROM voc CROSS JOIN pri p CROSS JOIN vn
       |  JOIN tot ON tot.lang = p.lang
       |  LEFT JOIN cnt c ON c.lang = p.lang AND c.tok = voc.tok),
       |sc AS (SELECT tk.doc_id, m.lang AS cls, sum(m.logp) AS s
       |  FROM tok tk JOIN model m ON m.tok = tk.tok GROUP BY 1, 2),
       |scored AS (SELECT sc.doc_id, sc.cls,
       |    round(sc.s + ln(CAST(p.d AS DOUBLE) / nn.n), 6) AS score
       |  FROM sc JOIN pri p ON p.lang = sc.cls CROSS JOIN nn),
       |rk AS (SELECT doc_id, cls AS pred_lang,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS r
       |  FROM scored)
       |SELECT d.doc_id, d.lang, rk.pred_lang,
       |  CAST(d.lang = rk.pred_lang AS INTEGER) AS hit
       |FROM rk JOIN documents d USING (doc_id) WHERE rk.r = 1""".stripMargin
}
