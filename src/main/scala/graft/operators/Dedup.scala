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

  /** ORDERED non-empty word tokens (shingling needs sequence order,
    * unlike the set-semantics tokensCol).
    */
  def wordSeqCol(text: Column): Column =
    filter(split(lower(text), "\\s+"), x => x =!= "")

  /** Distinct word n-gram shingles — the n-gram unit for Jaccard
    * similarity (n consecutive words joined with one space). Captures
    * local word ORDER, which unigram word sets cannot: two docs with
    * the same vocabulary but different phrasing share unigrams yet few
    * shingles. Docs with fewer than n words shingle to an empty set.
    */
  def shinglesCol(text: Column, n: Int): Column = {
    val w = wordSeqCol(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct shingles as SORTED cross-engine poly-hash LONGS, built
    * in one native pass over the word array (no shingle strings, no
    * per-element HOF re-evaluation): the verify join then merges
    * 8-byte sets instead of re-hashing multi-word strings per
    * candidate pair. Hash collisions collapse identically on both
    * engines (same family), so oracle equality is preserved exactly.
    */
  def shingleHashesCol(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.ShingleHashes(
      ColumnBridge.expression(wordSeqCol(text)), n))
  }

  /** Windowed n-gram-shingle Jaccard near-dup pairs: identical block
    * equi-join shape to `jaccardPairs` (same linear candidate volume),
    * similarity computed over distinct word n-grams instead of the
    * unigram word set. Docs shingling empty (fewer than n words) never
    * pair — an empty set has no meaningful Jaccard to anything.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, idWindow: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val t = docs.select(col("doc_id"), col("lang"), shingleHashesCol(col("text"), n).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("blk", floor(col("doc_id") / idWindow))
    val probe = t.withColumn("probe_blk", explode(array(col("blk"), col("blk") + 1)))
    val a = probe.as("a"); val b = t.as("b")
    // size prefilter: J >= t forces min(|A|,|B|) >= t * max(|A|,|B|)
    // (|A∩B| <= min, |A∪B| >= max) — prunes length-mismatched pairs
    // before the merge pays O(|A|+|B|). Result-preserving against the
    // unrounded Jaccard; the oracle applies the SAME prefilter so the
    // round(J,6) knife edge prunes identically on both engines. The
    // merge itself is the native sorted-long kernel (zero allocation
    // per pair) instead of hash-set-building array_intersect/
    // array_distinct.
    val sizeOk = least(size(col("a.sh")), size(col("b.sh"))).cast("double") >=
      lit(threshold) * greatest(size(col("a.sh")), size(col("b.sh"))).cast("double")
    val mergeJac = ColumnBridge.column(graft.functions.SortedLongJaccard(
      ColumnBridge.expression(col("a.sh")), ColumnBridge.expression(col("b.sh"))))
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.probe_blk") === col("b.blk") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.doc_id") <= col("a.doc_id") + idWindow && sizeOk)
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        round(mergeJac, 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Windowed n-gram-shingle CONTAINMENT pairs: |A∩B| / min(|A|,|B|)
    * over distinct shingle sets — the asymmetric near-dup signal. A
    * short doc verbatim-quoted inside a long one scores ~1.0 here
    * while its Jaccard is only ~|A|/|B| and sails under every
    * symmetric threshold; excerpt/quotation reuse is a duplication
    * class of its own in training corpora. Same block equi-join shape
    * as jaccardPairs, but NO size prefilter (containment is
    * deliberately size-ratio-unbounded — the mismatched-length pair is
    * the whole point).
    */
  def containmentPairs(docs: DataFrame, n: Int, idWindow: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val t = docs.select(col("doc_id"), col("lang"), shingleHashesCol(col("text"), n).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("blk", floor(col("doc_id") / idWindow))
    val probe = t.withColumn("probe_blk", explode(array(col("blk"), col("blk") + 1)))
    val a = probe.as("a"); val b = t.as("b")
    val cont = ColumnBridge.column(graft.functions.SortedLongContainment(
      ColumnBridge.expression(col("a.sh")), ColumnBridge.expression(col("b.sh"))))
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.probe_blk") === col("b.blk") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.doc_id") <= col("a.doc_id") + idWindow)
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        round(cont, 6).as("containment"))
      .where(col("containment") >= threshold)
  }

  /** DuckDB oracle of containmentPairs (same hash family/constants). */
  def containmentOracleSql(n: Int, idWindow: Int, threshold: Double): String = {
    val shingle = (0 until n).map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(" || ' ' || ")
    val cont = "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
      "CAST(least(len(a.sh), len(b.sh)) AS DOUBLE), 6)"
    s"""WITH t AS (SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |st AS (SELECT doc_id, lang,
       |    CASE WHEN len(w) >= $n THEN
       |      list_distinct(list_transform(generate_series(1, len(w) - ${n - 1}), i -> $shingle))
       |    ELSE CAST([] AS VARCHAR[]) END AS shs
       |  FROM t),
       |h AS (SELECT doc_id, lang,
       |    list_distinct(list_transform(shs, s -> ${combinedHashSql("s")})) AS sh FROM st),
       |nz AS (SELECT * FROM h WHERE len(sh) > 0)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $cont AS containment
       |FROM nz a JOIN nz b
       |  ON a.lang = b.lang AND a.doc_id < b.doc_id AND b.doc_id <= a.doc_id + $idWindow
       |WHERE $cont >= $threshold""".stripMargin
  }

  /** DuckDB oracle of jaccardPairs (same hashed-token-set face). Pass
    * `idsOnly = true` for the edge-list form the components oracle
    * embeds.
    */
  /** The size prefilter, restated for the oracles: J >= t forces
    * min(|A|,|B|) >= t * max(|A|,|B|), so pruning on it is
    * result-preserving against the UNROUNDED Jaccard — and because
    * round(J, 6) can nudge a just-below-t pair over the line, the
    * SAME prefilter is applied on BOTH engines so even that knife
    * edge prunes identically.
    */
  private def sizeOkSql(a: String, b: String, threshold: Double): String =
    s"CAST(least(len($a), len($b)) AS DOUBLE) >= $threshold * CAST(greatest(len($a), len($b)) AS DOUBLE)"

  def jaccardPairsOracleSql(idWindow: Int, threshold: Double, idsOnly: Boolean = false): String = {
    val jac = "round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / " +
      "CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE), 6)"
    val proj = if (idsOnly) "" else s", $jac AS jaccard"
    s"""WITH w AS (SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS words
       |  FROM documents),
       |t AS (SELECT doc_id, lang, ${tokenHashesSql("words")} AS toks FROM w),
       |nz AS (SELECT * FROM t WHERE len(toks) > 0)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b$proj
       |FROM nz a JOIN nz b
       |  ON a.lang = b.lang AND a.doc_id < b.doc_id AND b.doc_id <= a.doc_id + $idWindow
       |  AND ${sizeOkSql("a.toks", "b.toks", threshold)}
       |WHERE $jac >= $threshold""".stripMargin
  }

  /** DuckDB oracle of ngramJaccardPairs (same constants, same poly
    * hash family — polyHash restated as the unicode-fold, so even a
    * hash collision collapses identically on both engines).
    */
  def ngramJaccardOracleSql(n: Int, idWindow: Int, threshold: Double): String = {
    // w[i] || ' ' || w[i+1] || ... (DuckDB lists are 1-based)
    val shingle = (0 until n).map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(" || ' ' || ")
    val hash = combinedHashSql("s")
    val jac = "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
      "CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6)"
    s"""WITH t AS (SELECT doc_id, lang,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |st AS (SELECT doc_id, lang,
       |    CASE WHEN len(w) >= $n THEN
       |      list_distinct(list_transform(generate_series(1, len(w) - ${n - 1}), i -> $shingle))
       |    ELSE CAST([] AS VARCHAR[]) END AS shs
       |  FROM t),
       |h AS (SELECT doc_id, lang,
       |    list_distinct(list_transform(shs, s -> $hash)) AS sh FROM st),
       |nz AS (SELECT * FROM h WHERE len(sh) > 0)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, $jac AS jaccard
       |FROM nz a JOIN nz b
       |  ON a.lang = b.lang AND a.doc_id < b.doc_id AND b.doc_id <= a.doc_id + $idWindow
       |  AND ${sizeOkSql("a.sh", "b.sh", threshold)}
       |WHERE $jac >= $threshold""".stripMargin
  }

  /** Corpus-WIDE exact span duplication: pairs of docs sharing at
    * least one identical n-word span, with the shared-span count —
    * the span-granular analogue of exact-substring training-data
    * dedup (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"), where verbatim boilerplate/citation reuse is
    * the target rather than whole-doc similarity.
    *
    * Unlike the windowed Jaccard paths this is NOT id-blocked: the
    * candidate structure is an INVERTED INDEX on shingle hashes (one
    * posting per (span-hash, doc)), so any two docs anywhere in the
    * corpus sharing a span meet on its hash — one explode, one
    * hot-key cap, one equi-join, all linear in posting volume. Spans
    * shared by more than `maxPostings` docs (global boilerplate —
    * headers, licenses) are dropped by the same anti-join cap as the
    * LSH buckets: they would pair everyone with everyone (quadratic)
    * while signalling template reuse, not doc-pair duplication.
    * Shingle hashes per doc are DISTINCT, so n_spans counts distinct
    * shared spans.
    */
  def spanOverlapPairs(docs: DataFrame, n: Int,
                       maxPostings: Int = MaxBucketSize): DataFrame = {
    val inv = docs.select(col("doc_id"),
        explode(shingleHashesCol(col("text"), n)).as("sh"))
    val cold = dropHotBuckets(inv, Seq("sh"), maxPostings)
    cold.as("a").join(cold.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).cast("long").as("n_spans"))
  }

  /** DuckDB oracle of spanOverlapPairs (same hash family/constants). */
  def spanOverlapOracleSql(n: Int, maxPostings: Int = MaxBucketSize): String = {
    val shingle = (0 until n).map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w
       |  FROM documents),
       |st AS (SELECT doc_id,
       |    CASE WHEN len(w) >= $n THEN
       |      list_distinct(list_transform(generate_series(1, len(w) - ${n - 1}), i -> $shingle))
       |    ELSE CAST([] AS VARCHAR[]) END AS shs FROM t),
       |h AS (SELECT doc_id, list_distinct(list_transform(shs, s -> ${combinedHashSql("s")})) AS shl
       |  FROM st WHERE len(shs) > 0),
       |inv AS (SELECT doc_id, unnest(shl) AS sh FROM h),
       |cold AS (SELECT * FROM inv QUALIFY count(*) OVER (PARTITION BY sh) <= $maxPostings)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_spans
       |FROM cold a JOIN cold b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin
  }

  /** Per-doc REPETITION fractions (Gopher-rule-style quality
    * signals): for n-gram width n, 1 - distinct/total over the doc's
    * own n-grams — high values flag the looping/boilerplate-stuffed
    * docs a training pipeline filters before tokenization. Distinct is
    * counted over the 62-bit shingle hashes (one native pass), so the
    * oracle's hash-collision behavior is identical by construction.
    * Docs with fewer than n words score 0.0 (nothing to repeat).
    */
  def repetitionFracCol(text: Column, n: Int): Column = {
    val total = greatest(size(wordSeqCol(text)) - (n - 1), lit(0)).cast("double")
    val distinctN = size(shingleHashesCol(text, n)).cast("double")
    when(total > 0, round(lit(1.0) - distinctN / total, 6)).otherwise(lit(0.0))
  }

  /** DuckDB twin of repetitionFracCol over a word list `w`. */
  def repetitionFracSql(w: String, n: Int): String = {
    val shingle = (0 until n).map(k => if (k == 0) s"$w[i]" else s"$w[i+$k]").mkString(" || ' ' || ")
    val distinctN =
      s"len(list_distinct(list_transform(list_transform(generate_series(1, len($w) - ${n - 1}), i -> $shingle), s -> ${combinedHashSql("s")})))"
    val total = s"greatest(len($w) - ${n - 1}, 0)"
    s"(CASE WHEN $total > 0 THEN round(1.0 - CAST($distinctN AS DOUBLE) / CAST($total AS DOUBLE), 6) ELSE 0.0 END)"
  }

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

  /** Sorted distinct cross-engine 62-bit combined poly hashes of the
    * word-SET tokens (ShingleHashes at width 1 — post-hash dedupe ≡
    * distinct words then hash, collisions collapsing identically in
    * DuckDB). 62-bit per round-3 advice: verify-side sets need
    * collision fidelity the lone 31-bit family lacks at ~100k tokens.
    */
  def tokenHashesCol(text: Column): Column = shingleHashesCol(text, 1)

  /** One base-`base` code-point poly fold over a string expr (DuckDB). */
  private def polyFoldSql(expr: String, base: Long): String = {
    import graft.functions.SketchKernels.PolyM
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      raw"list_transform(regexp_extract_all($expr, '[\s\S]'), ch -> CAST(unicode(ch) AS BIGINT))), " +
      s"(a, b) -> (a * $base + b) % $PolyM)"
  }

  /** DuckDB twin of SketchKernels.combinedHash: (hA << 31) + hB with
    * both addends < 2^31, exact in BIGINT.
    */
  private def combinedHashSql(expr: String): String =
    s"(${polyFoldSql(expr, 131L)} * 2147483648 + ${polyFoldSql(expr, graft.functions.SketchKernels.Poly2Base)})"

  /** DuckDB face of tokenHashesCol over a word list `w`. */
  private[operators] def tokenHashesSql(w: String): String =
    s"list_distinct(list_transform($w, s -> ${combinedHashSql("s")}))"

  /** Windowed n-gram (word-set) Jaccard near-dup pairs: candidate pairs
    * restricted to same-language docs within an id window (the exact
    * quadratic fallback used to validate the LSH path on samples).
    *
    * Implemented as a BLOCK EQUI-JOIN, not a range join: a naive
    * `a.id < b.id <= a.id + w` predicate plans as a nested-loop cross
    * product (O(n^2) at any scale). A pair within the window spans at
    * most two consecutive id-blocks of width w, so probing block and
    * block+1 turns it into a shuffled hash join with linear candidate
    * volume. The verify compares poly-hashed token SETS with the
    * zero-allocation sorted-merge kernel behind the size prefilter
    * (J >= t forces min >= t*max; the oracle applies the same
    * prefilter — see sizeOkSql).
    */
  def jaccardPairs(docs: DataFrame, idWindow: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val t = docs.select(col("doc_id"), col("lang"), tokenHashesCol(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("blk", floor(col("doc_id") / idWindow))
    val probe = t.withColumn("probe_blk", explode(array(col("blk"), col("blk") + 1)))
    val a = probe.as("a"); val b = t.as("b")
    val sizeOk = least(size(col("a.toks")), size(col("b.toks"))).cast("double") >=
      lit(threshold) * greatest(size(col("a.toks")), size(col("b.toks"))).cast("double")
    val mergeJac = ColumnBridge.column(graft.functions.SortedLongJaccard(
      ColumnBridge.expression(col("a.toks")), ColumnBridge.expression(col("b.toks"))))
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.probe_blk") === col("b.blk") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.doc_id") <= col("a.doc_id") + idWindow && sizeOk)
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        round(mergeJac, 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signature column: `perms` permutations approximated by
    * seeded xxhash64 of each token; signature(i) = min over tokens.
    * Catalyst-HOF reference form — kept as the property-tested twin of
    * the native expression below (SketchSpec), NOT used in the hot
    * path: it re-traverses (and re-hashes) the token array once per
    * permutation in interpreted HOFs. Empty token arrays yield null
    * (matching the native expression — see MinHashSignature's
    * hot-bucket rationale).
    */
  def minhashSignatureCol(tokens: Column, perms: Int): Column =
    when(size(tokens) > 0,
      array((0 until perms).map { i =>
        array_min(transform(tokens, t => xxhash64(t, lit(i))))
      }: _*))

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

  /** Drop members of over-populated (band, bucket) groups. Implemented
    * as a groupBy-count + anti-join of the hot keys (replacing a
    * window count, which paid a full sort per bucket partition). The
    * join strategy is deliberately left to AQE: hot keys are normally
    * few (each holds > maxBucketSize rows, so at most n/maxBucketSize
    * exist) and AQE broadcasts them at runtime — but an adversarially
    * self-similar corpus can make MOST buckets hot, and a forced
    * broadcast() of ~n/bands keys would kill the job where a shuffled
    * anti-join degrades gracefully.
    */
  private def dropHotBuckets(banded: DataFrame, keys: Seq[String], maxBucketSize: Int): DataFrame = {
    val hot = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > maxBucketSize)
      .select(keys.map(col): _*)
    banded.join(hot, keys, "left_anti")
  }

  /** Candidate pairs from a banded (doc_id, band, bucket) table,
    * verified with ONE Jaccard per unique pair. Shape chosen for
    * scale: the banded table is SLIM (no token arrays), so the
    * candidate self-join shuffles three small columns; candidates
    * dedupe on the two-long id pair BEFORE verification (a pair
    * sharing k bands would otherwise shuffle its token arrays and pay
    * the Jaccard k times); token-HASH sets (sorted longs) join back
    * once per side, and the verify is the zero-allocation sorted-merge
    * kernel. `withToks` must carry (doc_id, toks: array<long>, sorted
    * distinct).
    */
  private def lshPairsVerified(withToks: DataFrame, cold: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val a = cold.as("a"); val b = cold.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val mergeJac = ColumnBridge.column(graft.functions.SortedLongJaccard(
      ColumnBridge.expression(col("toks_a")), ColumnBridge.expression(col("toks_b"))))
    pairs
      .join(withToks.select(col("doc_id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(withToks.select(col("doc_id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .select(col("id_a"), col("id_b"), round(mergeJac, 6).as("jaccard"))
  }

  def minhashLshPairs(docs: DataFrame, bands: Int, rowsPerBand: Int, threshold: Double,
                      maxBucketSize: Int = MaxBucketSize): DataFrame = {
    val perms = bands * rowsPerBand
    // string tokens feed the signature; sorted hash sets feed the
    // verify (column pruning keeps each branch to its own column)
    val withToks = docs.select(col("doc_id"), tokensCol(col("text")).as("toks_str"),
      tokenHashesCol(col("text")).as("toks"))
    val banded = withToks
      .withColumn("sig", minhashSignature(col("toks_str"), perms))
      .where(col("sig").isNotNull) // empty-token docs sketch nothing
      .select(
        col("doc_id"),
        posexplode(array((0 until bands).map { b =>
          xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
        }: _*)).as(Seq("band", "bucket")))
    lshPairsVerified(withToks, dropHotBuckets(banded, Seq("band", "bucket"), maxBucketSize))
      .where(col("jaccard") >= threshold)
  }

  /** Shared spine of every poly-banded MinHash pipeline: sketches +
    * banded buckets with the hot-bucket cap applied. Returns
    * (withSketch, coldBanded) — withSketch carries (doc_id, extra...,
    * toks_str, toks); coldBanded carries (doc_id, extra..., band,
    * bucket). The self-join (near-dup pairs) and the cross-set join
    * (incremental ingest) differ only in how they pair coldBanded
    * rows, so the banding/capping/verify contract lives here once.
    */
  private def coldBandedPoly(docs: DataFrame, extra: Seq[String],
                             bands: Int, rowsPerBand: Int,
                             maxBucketSize: Int): (DataFrame, DataFrame) = {
    val (withSketch, banded) = bandedPoly(docs, extra, bands, rowsPerBand)
    (withSketch, dropHotBuckets(banded, Seq("band", "bucket"), maxBucketSize))
  }

  /** Sketches + banded buckets WITHOUT the hot-bucket cap — callers
    * pick the capping policy (dropHotBuckets for pair mining,
    * corpus-side representative sampling for the ingest gate).
    *
    * `shingleN` picks the similarity unit: 1 = unigram word SET
    * (buckets from token strings, the historical path); n > 1 = word
    * n-gram shingles — ORDER-sensitive similarity — where both the
    * verify set and the band buckets derive from one ShingleHashes
    * pass (buckets via the >>> 31 base extraction, so no shingle
    * string is ever materialized).
    */
  private def bandedPoly(docs: DataFrame, extra: Seq[String],
                         bands: Int, rowsPerBand: Int,
                         shingleN: Int = 1): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.graft.ColumnBridge
    val keyCols = col("doc_id") +: extra.map(col)
    if (shingleN == 1) {
      val withSketch = docs.select(
        keyCols :+ tokensCol(col("text")).as("toks_str") :+ tokenHashesCol(col("text")).as("toks"): _*)
      val banded = withSketch
        .withColumn("bks", minhashPolyBuckets(col("toks_str"), bands, rowsPerBand))
        .where(col("bks").isNotNull)
        .select(keyCols :+ posexplode(col("bks")).as(Seq("band", "bucket")): _*)
      (withSketch, banded)
    } else {
      val withSketch = docs.select(
        keyCols :+ shingleHashesCol(col("text"), shingleN).as("toks"): _*)
      val bks = ColumnBridge.column(graft.functions.MinHashPolyBucketsFromCombined(
        ColumnBridge.expression(col("toks")), bands, rowsPerBand))
      val banded = withSketch
        .withColumn("bks", bks)
        .where(col("bks").isNotNull)
        .select(keyCols :+ posexplode(col("bks")).as(Seq("band", "bucket")): _*)
      (withSketch, banded)
    }
  }

  /** Token-bounded training chunks with overlap over the ORDERED,
    * case-preserving token sequence (chunking feeds the tokenizer;
    * lowercasing is the dedup paths' normalization, not chunking's).
    */
  def chunkTokensCol(text: Column, size: Int, overlap: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.ChunkTokens(
      ColumnBridge.expression(filter(split(text, "\\s+"), x => x =!= "")), size, overlap))
  }

  /** Incremental ingestion gate — the dedup decision a production
    * pipeline runs when a NEW batch lands against an EXISTING corpus:
    * keep a new doc iff it is (a) not an exact duplicate of any corpus
    * doc (digest anti-join) and (b) not a verified near-duplicate of
    * any corpus doc (cross-set banded MinHash join: new-side buckets
    * probe corpus-side buckets — same linear candidate volume as the
    * self-join case, hot buckets capped across both sides, verify on
    * hashed token sets). Returns the kept new-side doc_ids.
    *
    * At scale the corpus side's banded table is the big side; the
    * join is a plain shuffled equi-join on (band, bucket) and AQE
    * broadcasts the (usually much smaller) new batch at runtime.
    *
    * Hot-bucket policy — this path is an ADMISSION decision, not pair
    * mining, so whole hot buckets are never dropped (round-3 advice: a
    * new doc near-duplicating a template repeated > maxBucketSize
    * times in the corpus would lose every shared bucket and be
    * admitted — heavy duplication is exactly when the gate must fire).
    * Instead the CORPUS side keeps the `maxBucketSize` lowest-doc_id
    * REPRESENTATIVES per (band, bucket) — any near-dup of the bucket's
    * contents still meets a representative and verifies — and the new
    * side is never capped. Candidate volume per bucket stays
    * O(maxBucketSize * new-side rows), linear in the batch.
    */
  def incrementalIngestFilter(docs: DataFrame, isCorpus: Column,
                              bands: Int, rowsPerBand: Int, threshold: Double,
                              maxBucketSize: Int = MaxBucketSize,
                              shingleN: Int = 1): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val tagged = docs.select(col("doc_id"), col("text"), isCorpus.as("is_corpus"))
    val corpusDigests = tagged.where(col("is_corpus"))
      .select(md5(col("text")).as("digest")).distinct()
    val newDocs = tagged.where(!col("is_corpus"))
    val afterExact = newDocs
      .withColumn("digest", md5(col("text")))
      .join(corpusDigests, Seq("digest"), "left_anti")

    val (withSketch, banded) = bandedPoly(tagged, Seq("is_corpus"), bands, rowsPerBand, shingleN)
    val wRep = Window.partitionBy(col("band"), col("bucket")).orderBy(col("doc_id"))
    val corpusReps = banded.where(col("is_corpus"))
      .withColumn("rn", row_number().over(wRep))
      .where(col("rn") <= maxBucketSize).drop("rn")
    val cands = banded.where(!col("is_corpus")).as("a")
      .join(corpusReps.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("id_new"), col("b.doc_id").as("id_old"))
      .distinct()
    val mergeJac = ColumnBridge.column(graft.functions.SortedLongJaccard(
      ColumnBridge.expression(col("ta")), ColumnBridge.expression(col("tb"))))
    val nearDupNew = cands
      .join(withSketch.where(!col("is_corpus"))
        .select(col("doc_id").as("id_new"), col("toks").as("ta")), "id_new")
      .join(withSketch.where(col("is_corpus"))
        .select(col("doc_id").as("id_old"), col("toks").as("tb")), "id_old")
      .where(round(mergeJac, 6) >= threshold)
      .select(col("id_new").as("doc_id")).distinct()

    afterExact.join(nearDupNew, Seq("doc_id"), "left_anti").select(col("doc_id"))
  }

  /** CTE block restating ONE admission-gate decision over a relation
    * `$baseRel(doc_id, text, is_corpus)`; every CTE name carries the
    * `$p` prefix so blocks can be CHAINED (the streaming oracle runs
    * one per micro-batch with an accreting base). The final CTE
    * `${p}kept` holds the admitted new-side doc_ids. `shingleN` > 1
    * restates the order-sensitive face: shingle strings -> distinct
    * combined hashes -> the base-131 fold recovered by division (the
    * SQL twin of the kernel's `>>> 31`).
    */
  private def ingestGateCtesSql(p: String, baseRel: String,
                                bands: Int, rowsPerBand: Int, threshold: Double,
                                maxBucketSize: Int, shingleN: Int): String = {
    val (sigCols, bucketCols, bandStructs) = minhashBandSql(bands, rowsPerBand)
    val headCtes = if (shingleN == 1)
      s"""${p}t AS (SELECT doc_id, is_corpus, list_filter(list_distinct(regexp_split_to_array(lower(text), '\\s+')), x -> x <> '') AS toks FROM $baseRel),
         |${p}h AS (SELECT doc_id, is_corpus, $polyHashListSql AS hs, $combinedHashListSql AS hs2 FROM ${p}t WHERE len(toks) > 0),
         |${p}sig AS (SELECT doc_id, is_corpus, list_distinct(hs2) AS ht, $sigCols FROM ${p}h),""".stripMargin
    else {
      val shingle = (0 until shingleN).map(k => if (k == 0) "w[i]" else s"w[i+$k]").mkString(" || ' ' || ")
      s"""${p}t AS (SELECT doc_id, is_corpus, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS w FROM $baseRel),
         |${p}st AS (SELECT doc_id, is_corpus,
         |    CASE WHEN len(w) >= $shingleN THEN
         |      list_distinct(list_transform(generate_series(1, len(w) - ${shingleN - 1}), i -> $shingle))
         |    ELSE CAST([] AS VARCHAR[]) END AS shs FROM ${p}t),
         |${p}h AS (SELECT doc_id, is_corpus, list_distinct(list_transform(shs, s -> ${combinedHashSql("s")})) AS ht
         |  FROM ${p}st WHERE len(shs) > 0),
         |${p}hb AS (SELECT doc_id, is_corpus, ht, list_transform(ht, x -> x // 2147483648) AS hs FROM ${p}h),
         |${p}sig AS (SELECT doc_id, is_corpus, ht, $sigCols FROM ${p}hb),""".stripMargin
    }
    s"""$headCtes
       |${p}bk AS (SELECT doc_id, is_corpus, ht, $bucketCols FROM ${p}sig),
       |${p}banded AS (SELECT doc_id, is_corpus, ht, u['band'] AS band, u['bucket'] AS bucket
       |  FROM ${p}bk, UNNEST([$bandStructs]) AS un(u)),
       |${p}reps AS (SELECT * FROM ${p}banded WHERE is_corpus
       |  QUALIFY row_number() OVER (PARTITION BY band, bucket ORDER BY doc_id) <= $maxBucketSize),
       |${p}cand AS (SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
       |  FROM ${p}banded a JOIN ${p}reps b ON a.band = b.band AND a.bucket = b.bucket
       |  WHERE NOT a.is_corpus),
       |${p}neardup AS (SELECT DISTINCT c.id_new FROM ${p}cand c
       |  JOIN ${p}sig sa ON sa.doc_id = c.id_new
       |  JOIN ${p}sig sb ON sb.doc_id = c.id_old
       |  WHERE ${jaccardSql("sa.ht", "sb.ht")} >= $threshold),
       |${p}exact AS (SELECT DISTINCT n.doc_id FROM $baseRel n JOIN $baseRel c
       |  ON NOT n.is_corpus AND c.is_corpus AND md5(n.text) = md5(c.text)),
       |${p}kept AS (SELECT doc_id FROM $baseRel WHERE NOT is_corpus
       |  AND doc_id NOT IN (SELECT doc_id FROM ${p}exact)
       |  AND doc_id NOT IN (SELECT id_new FROM ${p}neardup))""".stripMargin
  }

  /** DuckDB oracle of incrementalIngestFilter (same constants; the
    * corpus/new split is restated by `corpusPred` over `documents`).
    */
  def incrementalIngestOracleSql(corpusPred: String, bands: Int, rowsPerBand: Int,
                                 threshold: Double,
                                 maxBucketSize: Int = MaxBucketSize,
                                 shingleN: Int = 1): String =
    s"""WITH base AS (SELECT doc_id, text, ($corpusPred) AS is_corpus FROM documents),
       |${ingestGateCtesSql("g_", "base", bands, rowsPerBand, threshold, maxBucketSize, shingleN)}
       |SELECT doc_id FROM g_kept""".stripMargin

  /** DuckDB oracle of IngestStream.ingestBatchTwin: `nBatches` gate
    * blocks chained in batch order, each block's base = corpus ∪ all
    * earlier admissions ∪ its own batch — the accreting-corpus
    * semantics of the streaming gate, restated as one SQL statement.
    */
  def streamingIngestOracleSql(corpusPred: String, batchExpr: String, nBatches: Int,
                               bands: Int, rowsPerBand: Int, threshold: Double,
                               maxBucketSize: Int = MaxBucketSize,
                               shingleN: Int = 1): String = {
    val blocks = (0 until nBatches).map { k =>
      val prevAdmissions = (0 until k).map(j =>
        s"  UNION ALL SELECT doc_id, text, TRUE AS is_corpus FROM adm$j").mkString("\n")
      s"""b$k AS (SELECT doc_id, text, TRUE AS is_corpus FROM all0 WHERE is_corpus
         |$prevAdmissions
         |  UNION ALL SELECT doc_id, text, FALSE AS is_corpus FROM all0 WHERE NOT is_corpus AND bno = $k),
         |${ingestGateCtesSql(s"g${k}_", s"b$k", bands, rowsPerBand, threshold, maxBucketSize, shingleN)},
         |adm$k AS (SELECT doc_id, text FROM all0
         |  WHERE NOT is_corpus AND bno = $k AND doc_id IN (SELECT doc_id FROM g${k}_kept))""".stripMargin
    }.mkString(",\n")
    val out = (0 until nBatches).map(k =>
      s"SELECT doc_id, CAST($k AS BIGINT) AS batch_id FROM g${k}_kept").mkString("\nUNION ALL ")
    s"""WITH all0 AS (SELECT doc_id, text, ($corpusPred) AS is_corpus, ($batchExpr) AS bno FROM documents),
       |$blocks
       |$out""".stripMargin
  }

  /** Native poly band buckets (cross-engine family; one pass). */
  def minhashPolyBuckets(tokens: Column, bands: Int, rowsPerBand: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.MinHashPolyBuckets(
      ColumnBridge.expression(tokens), bands, rowsPerBand))
  }

  /** MinHash-LSH candidate pairs over the CROSS-ENGINE polynomial hash
    * family (SketchKernels.minhashPoly): identical band->bucket->verify
    * pipeline to `minhashLshPairs`, but every step is restatable in
    * DuckDB SQL — this is the oracle-checked face of the LSH operator
    * (minhashLshOracleSql generates the oracle from the same
    * constants).
    */
  def minhashLshPairsPoly(docs: DataFrame, bands: Int, rowsPerBand: Int, threshold: Double,
                          maxBucketSize: Int = MaxBucketSize): DataFrame = {
    val (withToks, cold) = coldBandedPoly(docs, Nil, bands, rowsPerBand, maxBucketSize)
    lshPairsVerified(withToks, cold).where(col("jaccard") >= threshold)
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

  private def simhashPairsFromBlocked(blocked: DataFrame, maxHamming: Int,
                                      maxBucketSize: Int): DataFrame = {
    val cold = dropHotBuckets(blocked, Seq("q", "block"), maxBucketSize)
    val a = cold.as("a"); val b = cold.as("b")
    a.join(b,
        col("a.q") === col("b.q") && col("a.block") === col("b.block") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int,
                   maxBucketSize: Int = MaxBucketSize): DataFrame = {
    val sh = docs.select(col("doc_id"), simhashCol(tokensCol(col("text"))).as("simhash"))
      .where(col("simhash").isNotNull)
    val blocked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map { q =>
        shiftright(col("simhash"), q * 16).bitwiseAND(0xffffL)
      }: _*)).as(Seq("q", "block")))
    simhashPairsFromBlocked(blocked, maxHamming, maxBucketSize)
  }

  /** Native cross-engine 30-bit poly-SimHash column. */
  def simhashPolyCol(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.SimHashPoly(ColumnBridge.expression(tokens)))
  }

  /** SimHash near-dup pairs over the cross-engine poly hash: the
    * 30-bit signature is blocked on `blocks` equal-width chunks
    * (pigeonhole: any pair at hamming <= blocks-1 shares a chunk
    * EXACTLY; beyond that the blocking is the usual recall/cost
    * heuristic). The oracle-checked face of the SimHash operator
    * (simhashOracleSql, generated from the same constants).
    *
    * Default 3 chunks of 10 bits. 10-bit chunks saturate on dense
    * self-similar corpora (2^10 buckets — BASELINE.md); raising
    * `blocks` (5 x 6-bit, 6 x 5-bit) trades candidate volume for
    * recall at hamming <= blocks-1. `blocks` must divide 30; the
    * 64-bit xxhash64-quarters variant (`simhashPairs`) stays the
    * production default for high-density corpora.
    */
  def simhashPairsPoly(docs: DataFrame, maxHamming: Int,
                       maxBucketSize: Int = MaxBucketSize, blocks: Int = 3): DataFrame = {
    import graft.functions.SketchKernels.PolySimBits
    require(PolySimBits % blocks == 0, s"blocks=$blocks must divide $PolySimBits")
    val width = PolySimBits / blocks
    val sh = docs.select(col("doc_id"), simhashPolyCol(tokensCol(col("text"))).as("simhash"))
      .where(col("simhash").isNotNull)
    val blocked = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until blocks).map { q =>
        shiftright(col("simhash"), q * width).bitwiseAND((1L << width) - 1)
      }: _*)).as(Seq("q", "block")))
    simhashPairsFromBlocked(blocked, maxHamming, maxBucketSize)
  }

  /** Near-duplicate CLUSTER resolution: connected components over a
    * candidate-pair edge list (id_a < id_b), labeling every member
    * with the smallest doc id of its component — the step that turns
    * pair output into a keep/drop decision (keep = label == doc_id).
    *
    * Algorithm: ALTERNATING LARGE-STAR / SMALL-STAR contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — O(log^2 n) rounds guaranteed, ~log n observed,
    * independent of component DIAMETER. (Round 2 used min-label
    * propagation, whose round count is the diameter: a 5,000-doc
    * windowed-Jaccard chain already exceeded 100 rounds. Star
    * contraction resolves the same graph in single-digit rounds.)
    *
    *   large-star: every node links its LARGER neighbors to its
    *     neighborhood minimum (halves long paths each round);
    *   small-star: every node links its not-larger neighbors to that
    *     minimum (flattens local structure onto the minimum).
    *
    * Both steps preserve connected components exactly and only ever
    * link a node to a smaller one, so the fixed point is a forest of
    * STARS rooted at each component's minimum id. Each step is one
    * groupBy (per-node min) + one join back over the EDGE list — no
    * adjacency materialization, no driver-side data. Convergence is an
    * order-independent edge-set checksum (count + sum of xxhash64)
    * computed in ONE aggregate job per round; the star-forest shape is
    * then verified structurally (no node both root and leaf), so a
    * checksum collision cannot silently yield wrong labels.
    *
    * Checkpoint seam: by default rounds truncate lineage with
    * `localCheckpoint` (fastest; blocks are NON-recomputable under
    * executor loss — fine on local[32]). On a real cluster pass
    * `reliable = true` after `sc.setCheckpointDir(...)`: rounds then
    * use reliable `checkpoint()` files that survive executor loss
    * (files live until context stop unless
    * spark.cleaner.referenceTracking.cleanCheckpoints is set).
    *
    * Storage hygiene: each round's checkpoint blocks are unpersisted
    * as soon as the next round is materialized, the final labels are
    * materialized eagerly, and `base` + the converged edge list are
    * freed before returning — the only blocks that outlive the call
    * are the returned node-label table itself (2 longs per node; the
    * round-3 review found ~rounds x edge-list copies squatting in the
    * BlockManager for the life of the session).
    */
  def nearDupComponents(pairs: DataFrame, maxIters: Int = 50,
                        reliable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    if (reliable)
      require(pairs.sparkSession.sparkContext.getCheckpointDir.nonEmpty,
        "reliable=true needs sc.setCheckpointDir(...) first")
    def ckpt(df: DataFrame, eager: Boolean): DataFrame =
      if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
    // canonicalized pair list materialized ONCE — BOTH the edge set
    // and the node set derive from this checkpoint, so the upstream
    // candidate-pair query runs exactly once (deriving nodes from the
    // raw `pairs` would re-run it when the result is consumed)
    val base = ckpt(pairs.select(
        least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .distinct(), true)
    val nodes = base.select(col("lo").as("id"))
      .union(base.select(col("hi").as("id"))).distinct()
    // self-loops carry no connectivity (their ids stay in `nodes`)
    var edges = base.where(col("lo") =!= col("hi"))

    // order-independent edge-set fingerprint, one job (hash sum in
    // decimal(38,0): a long sum overflows under ANSI mode)
    def checksum(e: DataFrame): (Long, String) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("lo"), col("hi")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
    }
    // Each star op is ONE per-node-min window pass over the edge list
    // (one exchange, min computed in the same stage) — a groupBy +
    // join-back costs two exchanges per op. The composite round dedupes
    // once at the end: intermediate duplicate edges cannot change any
    // min. Hot-node skew puts a node's neighborhood in one partition —
    // inherent to the per-node reduce either way.
    // large-star: m(u) = min(N(u) ∪ {u}); emit (m(u), v) for v ∈ N(u), v > u
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      nbrs.withColumn("m", least(col("u"), min(col("v")).over(Window.partitionBy(col("u")))))
        .where(col("v") > col("u"))
        .select(col("m").as("lo"), col("v").as("hi"))
    }
    // small-star: orient edges toward the smaller endpoint; per node u
    // with smaller-neighbor set N(u), m = min(N(u)); emit (m, v) for
    // v ∈ N(u) \ {m} and (m, u) — the v == m row is rewritten to the
    // (m, u) root link, so one projection emits both kinds
    def smallStar(e: DataFrame): DataFrame = {
      val directed = e.select(col("hi").as("u"), col("lo").as("v"))
      directed.withColumn("m", min(col("v")).over(Window.partitionBy(col("u"))))
        .select(col("m").as("lo"),
          when(col("v") === col("m"), col("u")).otherwise(col("v")).as("hi"))
        .distinct()
    }

    var prev = checksum(edges)
    var converged = prev._1 == 0L
    var it = 0
    // round-checkpoint handles only (never base: round-1 `edges` is a
    // filter whose plan CONTAINS base's checkpoint — unpersisting it
    // would free base while `nodes` still needs it)
    var prevRound: Option[DataFrame] = None
    while (!converged && it < maxIters) {
      // LAZY checkpoint: the checksum aggregate is the action that
      // materializes it, so each round is ONE job (plus its shuffles)
      // instead of a materialize-job + a checksum-job
      val next = ckpt(smallStar(largeStar(edges)), false)
      val cur = checksum(next)
      // `next` is materialized now, so round k-1's blocks are dead
      prevRound.foreach(ColumnBridge.unpersistCheckpoint(_))
      prevRound = Some(next)
      converged = cur == prev
      edges = next
      prev = cur
      it += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] round $it edges=${cur._1}")
    }
    // silent non-convergence would hand downstream keep/drop WRONG
    // labels (multiple "representatives" per cluster); fail loudly
    if (!converged)
      throw new IllegalStateException(
        s"nearDupComponents did not converge in $maxIters rounds; raise maxIters")
    // structural star check, guarding the checksum against a
    // collision-induced false convergence: a converged forest has no
    // node that is both a root (lo) and a leaf (hi), and no leaf with
    // two distinct roots (either would silently mislabel clusters).
    // ONE aggregate pass over the cached converged edges — the
    // round-3 intersect+count form paid a two-sided dedup for a
    // weaker check (it missed the duplicate-root mode).
    val badStar = edges
      .select(col("lo").as("id"), lit(true).as("is_lo"), col("hi").as("other"))
      .union(edges.select(col("hi"), lit(false), col("lo")))
      .groupBy(col("id"))
      .agg(
        max(when(col("is_lo"), 1).otherwise(0)).as("as_lo"),
        max(when(!col("is_lo"), 1).otherwise(0)).as("as_hi"),
        countDistinct(when(!col("is_lo"), col("other"))).as("n_roots"))
      .where((col("as_lo") === 1 && col("as_hi") === 1) || col("n_roots") > 1)
      .limit(1).count()
    if (badStar != 0)
      throw new IllegalStateException(
        "nearDupComponents converged to a non-star edge set (checksum collision?)")
    // materialize the labels eagerly so every upstream block (base +
    // the converged rounds) can be freed HERE instead of leaking until
    // session end; the caller gets a self-contained checkpoint
    val labels = ckpt(nodes
      .join(edges.select(col("hi").as("id"), col("lo").as("label")), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label")), true)
    prevRound.foreach(ColumnBridge.unpersistCheckpoint(_))
    ColumnBridge.unpersistCheckpoint(base)
    labels
  }

  /** DuckDB oracle of nearDupComponents: min reachable id per node via
    * a recursive CTE (UNION dedupes, so the recursion is finite).
    * `pairsSql` must yield (id_a, id_b) with id_a < id_b.
    */
  def componentsOracleSql(pairsSql: String): String =
    // one recursive self-reference (DuckDB's requirement): edges are
    // made bidirectional first, then labels flow along directed edges
    s"""WITH RECURSIVE edges AS ($pairsSql),
       |dedges AS (SELECT id_a AS u, id_b AS v FROM edges UNION ALL SELECT id_b, id_a FROM edges),
       |nodes AS (SELECT id_a AS id FROM edges UNION SELECT id_b FROM edges),
       |reach(id, lbl) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT d.v, r.lbl FROM reach r JOIN dedges d ON d.u = r.id)
       |SELECT id, min(lbl) AS label FROM reach GROUP BY id""".stripMargin

  // ---- DuckDB oracle SQL for the poly pipelines ---------------------------
  //
  // Generated from the SAME constants as the Spark path (PolyM, permA/
  // permB, the 1000003 band fold, the 10-bit thirds), so the oracle and
  // the operator cannot drift apart. Every arithmetic step stays below
  // 2^63: A_p, h < 2^31 so A_p*h + B_p < 2^62; the band fold's
  // g*1000003 + sig < 2^52.

  /** toks CTE body shared by the poly oracles (DuckDB). */
  private def toksSql: String =
    "SELECT doc_id, list_filter(list_distinct(regexp_split_to_array(lower(text), '\\s+')), " +
      "x -> x <> '') AS toks FROM documents"

  /** Per-token 31-bit polynomial hash list (DuckDB twin of polyHash) —
    * feeds the MINHASH permutations, which need sub-2^63 arithmetic.
    */
  private def polyHashListSql: String =
    s"list_transform(toks, tk -> ${polyFoldSql("tk", 131L)})"

  /** Per-token 62-bit combined hash list — feeds the VERIFY sets. */
  private def combinedHashListSql: String =
    s"list_transform(toks, tk -> ${combinedHashSql("tk")})"

  private def jaccardSql(a: String, b: String): String =
    s"round(CAST(len(list_intersect($a, $b)) AS DOUBLE) / " +
      s"CAST(len(list_distinct(list_concat($a, $b))) AS DOUBLE), 6)"

  /** SQL fragments of the poly-MinHash signature/band fold, generated
    * ONCE for every oracle that bands (the self-join LSH oracle and
    * the cross-set ingest oracle must never drift apart).
    */
  private def minhashBandSql(bands: Int, rowsPerBand: Int): (String, String, String) = {
    import graft.functions.SketchKernels.{PolyM, permA, permB}
    val sigCols = (0 until bands * rowsPerBand).map { p =>
      s"list_min(list_transform(hs, x -> (${permA(p)} * x + ${permB(p)}) % $PolyM)) AS s$p"
    }.mkString(", ")
    val bucketCols = (0 until bands).map { b =>
      val fold = (0 until rowsPerBand).foldLeft("CAST(0 AS BIGINT)") { (acc, r) =>
        s"(($acc * 1000003 + s${b * rowsPerBand + r}) % $PolyM)"
      }
      s"$fold AS bk$b"
    }.mkString(", ")
    val bandStructs = (0 until bands).map(b => s"{'band': $b, 'bucket': bk$b}").mkString(", ")
    (sigCols, bucketCols, bandStructs)
  }

  def minhashLshOracleSql(bands: Int, rowsPerBand: Int, threshold: Double,
                          maxBucketSize: Int = MaxBucketSize): String = {
    val (sigCols, bucketCols, bandStructs) = minhashBandSql(bands, rowsPerBand)
    // verify over the DISTINCT token-hash sets (the Spark side merges
    // sorted hash sets; collisions collapse identically here)
    s"""WITH t AS ($toksSql),
       |h AS (SELECT doc_id, $polyHashListSql AS hs, $combinedHashListSql AS hs2 FROM t WHERE len(toks) > 0),
       |sig AS (SELECT doc_id, list_distinct(hs2) AS ht, $sigCols FROM h),
       |bk AS (SELECT doc_id, ht, $bucketCols FROM sig),
       |banded AS (SELECT doc_id, ht, u['band'] AS band, u['bucket'] AS bucket
       |  FROM bk, UNNEST([$bandStructs]) AS un(u)),
       |cold AS (SELECT * FROM banded QUALIFY count(*) OVER (PARTITION BY band, bucket) <= $maxBucketSize),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    ${jaccardSql("a.ht", "b.ht")} AS jaccard
       |  FROM cold a JOIN cold b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= $threshold""".stripMargin
  }

  def simhashOracleSql(maxHamming: Int, maxBucketSize: Int = MaxBucketSize,
                       blocks: Int = 3): String = {
    import graft.functions.SketchKernels.PolySimBits
    require(PolySimBits % blocks == 0, s"blocks=$blocks must divide $PolySimBits")
    val bitSum = (0 until PolySimBits).map { b =>
      s"(CASE WHEN 2 * list_sum(list_transform(hs, x -> (x >> $b) & 1)) > len(hs) " +
        s"THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString("(", " + ", ")")
    val third = PolySimBits / blocks
    val blockStructs = (0 until blocks).map { q =>
      s"{'q': $q, 'block': (sh >> ${q * third}) & ${(1L << third) - 1}}"
    }.mkString(", ")
    s"""WITH t AS ($toksSql),
       |h AS (SELECT doc_id, $polyHashListSql AS hs FROM t WHERE len(toks) > 0),
       |sim AS (SELECT doc_id, $bitSum AS sh FROM h),
       |blocked AS (SELECT doc_id, sh, u['q'] AS q, u['block'] AS block
       |  FROM sim, UNNEST([$blockStructs]) AS un(u)),
       |cold AS (SELECT * FROM blocked QUALIFY count(*) OVER (PARTITION BY q, block) <= $maxBucketSize),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    bit_count(xor(a.sh, b.sh)) AS hamming
       |  FROM cold a JOIN cold b ON a.q = b.q AND a.block = b.block AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM pairs WHERE hamming <= $maxHamming""".stripMargin
  }
}
