package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: exact dedup is a single hash aggregation (map-side
  * partial combine, one shuffle on the digest). MinHash-LSH and
  * SimHash avoid the O(n^2) pairwise join entirely: candidates come
  * from banded-signature / hamming-block equi-joins (shuffle keyed on
  * small band buckets), then only candidates are verified. At 10^12
  * docs the verify join is the tiny tail, not the head.
  */
object Dedup {

  /** Word tokens (lowercased, distinct) — the unit for Jaccard-style
    * similarity. split() emits a phantom "" token for leading/trailing
    * whitespace (limit -1 semantics); dropping it matters — two
    * unrelated docs that merely both end in '\n' would otherwise share
    * a token, inflating Jaccard and biasing every sketch.
    */
  def tokensCol(text: Column): Column =
    array_remove(array_distinct(split(lower(text), "\\s+")), "")

  /** Exact duplicate groups by content digest (md5). */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count("*").cast("long").as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Exact-dedup: keep the minimum id per digest. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  /** Word-set Jaccard similarity as a Column over two token arrays. */
  def jaccardCol(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** Windowed n-gram (word-set) Jaccard near-dup pairs: candidate pairs
    * restricted to same-language docs within an id window (the exact
    * quadratic fallback used to validate the LSH path on samples).
    *
    * Implemented as a BLOCK EQUI-JOIN, not a range join: a naive
    * `a.id < b.id <= a.id + w` predicate plans as a nested-loop cross
    * product (O(n^2) at any scale). A pair within the window spans at
    * most two consecutive id-blocks of width w, so probing block and
    * block+1 turns it into a shuffled hash join with linear candidate
    * volume.
    */
  def jaccardPairs(docs: DataFrame, idWindow: Int, threshold: Double): DataFrame = {
    val t = docs.select(col("doc_id"), col("lang"), tokensCol(col("text")).as("toks"))
      .withColumn("blk", floor(col("doc_id") / idWindow))
    val probe = t.withColumn("probe_blk", explode(array(col("blk"), col("blk") + 1)))
    val a = probe.as("a"); val b = t.as("b")
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.probe_blk") === col("b.blk") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.doc_id") <= col("a.doc_id") + idWindow)
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        round(jaccardCol(col("a.toks"), col("b.toks")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signature column: `perms` permutations approximated by
    * seeded xxhash64 of each token; signature(i) = min over tokens.
    * Catalyst-HOF reference form — kept as the property-tested twin of
    * the native expression below (SketchSpec), NOT used in the hot
    * path: it re-traverses (and re-hashes) the token array once per
    * permutation in interpreted HOFs.
    */
  def minhashSignatureCol(tokens: Column, perms: Int): Column =
    array((0 until perms).map { i =>
      array_min(transform(tokens, t => xxhash64(t, lit(i))))
    }: _*)

  /** Native single-pass MinHash signature (hashes each token once,
    * one int-mix per permutation; codegen'd).
    */
  def minhashSignature(tokens: Column, perms: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.MinHashSignature(
      ColumnBridge.expression(tokens), perms))
  }

  /** MinHash-LSH candidate pairs: signatures banded `bands` x
    * `rowsPerBand`; docs sharing any band bucket are candidates,
    * verified with true token Jaccard >= threshold.
    */
  /** Default cap on LSH bucket population. A degenerate corpus (every
    * doc similar) makes some buckets hold a large fraction of the
    * corpus, turning the candidate join quadratic; dropping hot
    * buckets is the standard recall/cost trade (hot-bucket members are
    * still paired through their other, selective bands).
    */
  val MaxBucketSize = 64

  def minhashLshPairs(docs: DataFrame, bands: Int, rowsPerBand: Int, threshold: Double,
                      maxBucketSize: Int = MaxBucketSize): DataFrame = {
    val perms = bands * rowsPerBand
    val sig = docs.select(col("doc_id"), tokensCol(col("text")).as("toks"))
      .withColumn("sig", minhashSignature(col("toks"), perms))
    val banded = sig.select(
      col("doc_id"), col("toks"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
      }: _*)).as(Seq("band", "bucket")))
    val cold = banded.withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .where(col("bucket_n") <= maxBucketSize)
    val a = cold.as("a"); val b = cold.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(jaccardCol(col("a.toks"), col("b.toks")), 6).as("jaccard"))
      .distinct()
      .where(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash from token hashes, as Catalyst expressions: for
    * each bit b, sum +-1 over tokens by that bit of xxhash64(token);
    * bit set iff the sum is positive. Reference twin of the native
    * expression (it allocates a 64-wide array per token inside an
    * interpreted aggregate — SketchSpec pins equality).
    */
  def simhashRefCol(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    val bitIdx = sequence(lit(0), lit(63))
    val sums = aggregate(hashes, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitIdx,
        (a, b) => a + when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(sums, bitIdx,
        (s, b) => when(s > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup pairs: block on the 4 16-bit quarters (a pair
    * within hamming distance <= 12 shares at least one exact quarter
    * only heuristically; quarter blocking is the standard recall/cost
    * trade — verified pairs are filtered by true hamming distance).
    */
  /** Native single-pass SimHash (hashes each token once, no per-token
    * allocation; codegen'd).
    */
  def simhashCol(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.SimHash64(ColumnBridge.expression(tokens)))
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   maxBucketSize: Int = MaxBucketSize): DataFrame = {
    val sh = docs.select(col("doc_id"), simhashCol(tokensCol(col("text"))).as("simhash"))
    val blocked = sh.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map { q =>
          shiftright(col("simhash"), q * 16).bitwiseAND(0xffffL)
        }: _*)).as(Seq("q", "block")))
      .withColumn("block_n", count(lit(1)).over(Window.partitionBy(col("q"), col("block"))))
      .where(col("block_n") <= maxBucketSize)
    val a = blocked.as("a"); val b = blocked.as("b")
    a.join(b,
        col("a.q") === col("b.q") && col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
