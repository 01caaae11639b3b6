package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reading-order recovery over positioned spans — the "PDF/layout
  * parse" face of the north rule's extraction tier: a document whose
  * spans carry page-box coordinates (PDF text runs, OCR word boxes —
  * the same (x, y) every real layout engine emits; the reference's
  * per-line segmentation at /root/reference/src/fast.py orders lines
  * by vertical projection only, i.e. the single-column special case)
  * is re-serialized in READING order, not storage order: detect the
  * column split, then read column-major / top-to-bottom.
  *
  * The column detection is the 1-D core of recursive XY-cut (Nagy et
  * al.): project span x-positions, find the widest horizontal gap,
  * and cut there iff the gap is at least `minColumnGap` (narrower
  * gaps are intra-column jitter, not gutters). Two-column layouts are
  * the overwhelmingly dominant multi-column case in print/PDF
  * corpora; the single-cut form keeps every step a plain window
  * function, restated verbatim in the DuckDB oracle (a full
  * recursive cut would trade that checkability for depth).
  *
  * Scale shape: all three windows partition by doc_id — ONE shuffle
  * of the narrow (doc_id, x, y, tok) projection co-locates each
  * document, then gap/argmax/rank all evaluate in that same
  * partitioning (no second exchange; documents are the parallelism
  * unit, and a document's spans always fit a task).
  */
object LayoutOrder {

  /** Recover reading order from span boxes. Input: (doc_id, x, y,
    * tok); output: (doc_id, read_order, colno, tok) with read_order
    * dense from 1 per doc, ordered by (column, y, x).
    *
    * A doc with no gap >= `minColumnGap` (single column, or a single
    * span — its lag-gap is NULL) takes the whole page as column 0.
    * Ties: the gap argmax takes the SMALLEST right-edge x; the final
    * rank breaks (colno, y) ties by x — both total orders, so the
    * result is deterministic on both engines.
    */
  def readingOrder(spans: DataFrame, minColumnGap: Double = 100.0): DataFrame = {
    val doc = Window.partitionBy("doc_id")
    val byX = doc.orderBy(col("x"), col("y"))
    spans
      .withColumn("gap", col("x") - lag(col("x"), 1).over(byX))
      .withColumn("maxgap", max(col("gap")).over(doc))
      .withColumn("split_x",
        min(when(col("gap") === col("maxgap") && col("maxgap") >= minColumnGap,
          col("x"))).over(doc))
      .withColumn("colno",
        when(col("split_x").isNotNull && col("x") >= col("split_x"), 1).otherwise(0))
      .withColumn("read_order",
        row_number().over(doc.orderBy(col("colno"), col("y"), col("x"))).cast("long"))
      .select(col("doc_id"), col("read_order"), col("colno"), col("tok"))
  }

  /** DuckDB twin of [[readingOrder]] over a spans relation `spansRel`
    * carrying (doc_id, x, y, tok).
    */
  def readingOrderSql(spansRel: String, minColumnGap: Double = 100.0): String =
    s"""g AS (SELECT *, x - lag(x) OVER (PARTITION BY doc_id ORDER BY x, y) AS gap
       |      FROM $spansRel),
       |m AS (SELECT *, max(gap) OVER (PARTITION BY doc_id) AS maxgap FROM g),
       |sx AS (SELECT *, min(CASE WHEN gap = maxgap AND maxgap >= $minColumnGap
       |                          THEN x END) OVER (PARTITION BY doc_id) AS split_x
       |       FROM m),
       |c AS (SELECT doc_id, tok, y, x,
       |        CASE WHEN split_x IS NOT NULL AND x >= split_x THEN 1 ELSE 0 END AS colno
       |      FROM sx)""".stripMargin

  // ---- fixture: a deterministic two-column page per document -------------

  /** Span boxes synthesized from each doc's first `TokensPerPage`
    * tokens: token i sits in column i/6 (gutter ~294 px wide), row
    * i%6, with deterministic sub-column jitter on both axes — so the
    * true reading order is exactly token order, and recovering it
    * requires finding the gutter from coordinates alone. Docs with
    * fewer than 7 tokens genuinely have one column (their x spread
    * is under 13 px), pinning the no-cut path on real data.
    */
  val TokensPerPage = 12

  def spanBoxes(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(slice(filter(split(lower(col("text")), "\\s+"), t => t =!= ""),
        1, TokensPerPage)).as(Seq("i", "tok")))
    toks.select(col("doc_id"), col("tok"),
      (lit(100) + when(col("i") < 6, 0).otherwise(300) + (col("i") * 7) % 13).as("x"),
      (lit(50) + (col("i") % 6) * 20 + (col("i") * 11) % 5).as("y"))
  }

  /** DuckDB twin of [[spanBoxes]] over `documents` (parallel unnest
    * carries the 1-based token index).
    */
  def spanBoxesSql: String =
    s"""t AS (SELECT doc_id,
       |        (list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |          x -> x <> ''))[1:$TokensPerPage] AS w FROM documents),
       |sp AS (SELECT doc_id, unnest(w) AS tok,
       |         unnest(generate_series(0, len(w) - 1)) AS i FROM t),
       |spans AS (SELECT doc_id, tok,
       |    100 + (CASE WHEN i < 6 THEN 0 ELSE 300 END) + (i * 7) % 13 AS x,
       |    50 + (i % 6) * 20 + (i * 11) % 5 AS y
       |  FROM sp)""".stripMargin
}
