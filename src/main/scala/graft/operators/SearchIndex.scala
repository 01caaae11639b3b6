package graft.operators

import graft.lake.LakeFormat
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED BM25 inverted index — the search analogue of `IvfIndex`
  * (round-4 verdict #5): `Search.bm25TopK` re-tokenizes the whole
  * corpus per query, which is the right one-shot shape but the wrong
  * build-once/query-many shape. Here the corpus is tokenized ONCE into
  * a postings table PARTITIONED BY A TERM-HASH BUCKET (`pterm =
  * pmod(xxhash64(term), nBuckets)`), so a query reads only the probed
  * terms' partitions — real directory pruning at the parquet scan; at
  * 10^12 docs a query touches ~|terms|/nBuckets of the index on disk
  * and none of the raw text.
  *
  * Tables (through the lake seam, Iceberg-swappable like IvfIndex):
  *  - `<name>_postings/pterm=N/`: (term, doc_id, tf, dl) — tf exact,
  *    dl carried denormalized so scoring needs no doc-length join;
  *  - `<name>_terms/pterm=N/`:    (term, df) — document frequencies;
  *  - `<name>_stats`:             one row (n_docs, sum_dl) — avgdl is
  *    recomputed as exact-sum/count at query time, the same
  *    ulp-stable form `bm25TopK` uses.
  *
  * Scoring is the identical Lucene-smoothed Okapi formula over the
  * identical exact integers, so `queryTopK` is pinned EQUAL to
  * `bm25TopK` on the same terms in OperatorsSpec (per-doc term-score
  * summation order may differ — the shared round(,6)/ulp caveat).
  */
object SearchIndex {

  final case class Index(lake: LakeFormat, name: String, nBuckets: Int)

  private def ptermCol(term: Column, nBuckets: Int): Column =
    pmod(xxhash64(term), lit(nBuckets.toLong))

  /** Tokenize once, write postings/terms/stats. The term-df table is
    * derived from the WRITTEN postings (columnar read-back), not a
    * second tokenization pass.
    */
  def build(docs: DataFrame, lake: LakeFormat, name: String, nBuckets: Int = 64): Index = {
    val base = docs
      .select(col("doc_id"), Dedup.wordSeqCol(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).as("dl"), col("w"))
    val postings = base
      .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("pterm", ptermCol(col("term"), nBuckets))
    lake.write(postings, s"${name}_postings", partitionBy = Seq("pterm"))
    val written = lake.read(docs.sparkSession, s"${name}_postings")
    lake.write(
      written.groupBy(col("pterm"), col("term")).agg(count(lit(1)).as("df")),
      s"${name}_terms", partitionBy = Seq("pterm"))
    // stats over ALL docs (including term-free ones, like bm25TopK)
    // with NO second tokenization pass (review round-5): n_docs is a
    // text-free count of the docs relation; sum_dl reduces the written
    // postings' denormalized dl (one per posting-bearing doc — a
    // token-free doc's dl is 0 and contributes nothing to the sum)
    val nDocs = docs.count()
    lake.write(
      written.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
        .agg(lit(nDocs).as("n_docs"), coalesce(sum(col("dl")), lit(0L)).as("sum_dl")),
      s"${name}_stats")
    Index(lake, name, nBuckets)
  }

  /** BM25 top-k against the index. The probed `pterm` values are
    * computed with the SAME xxhash64 the build used (a one-row Spark
    * job over the term literals — never a reimplementation that could
    * drift), and reach the postings scan as a partition IN-filter plus
    * a pushed `term IN` data filter. Everything corpus-sized flows
    * through one partial-aggregated groupBy(doc_id) and a TakeOrdered.
    */
  def queryTopK(spark: SparkSession, idx: Index, terms: Seq[String], k: Int,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    require(terms.nonEmpty && terms.forall(t => t == t.toLowerCase),
      "query terms must be nonempty and lowercase")
    val pts = terms.toDF("term")
      .select(ptermCol(col("term"), idx.nBuckets).as("pt"))
      .distinct().as[Long].collect().sorted
    def probed(table: String) =
      idx.lake.read(spark, s"${idx.name}_$table")
        .where(col("pterm").isin(pts.map(Long.box): _*) &&
          col("term").isin(terms: _*))
    val stats = idx.lake.read(spark, s"${idx.name}_stats")
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    val tf = col("tf").cast("double")
    val df = col("df").cast("double")
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
    val termScore = idf * (tf * lit(k1 + 1.0)) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    probed("postings")
      .join(broadcast(probed("terms").select(col("term"), col("df"))), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), termScore.as("s"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("s")), 6).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
