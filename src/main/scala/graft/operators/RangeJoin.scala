package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE (interval-containment) JOIN — match each point row to the
  * interval rows [lo, hi] that contain it: price-band classification,
  * IP-range → geo lookup, time-slot assignment, histogram-bucket
  * tagging. Spark has no native range join, and the naive
  * `p.v BETWEEN i.lo AND i.hi` predicate gives the optimizer no
  * equi-key: it plans a nested-loop (broadcast if lucky, cartesian if
  * not) that is O(|points| x |intervals|) — the same trap as the
  * windowed-pair spine in [[Dedup]], solved the same way.
  *
  * The scale-correct shape is BUCKET EXPANSION: pick a bucket width
  * W, explode each interval into the ceil(len/W)+1 buckets it
  * touches, tag each point with its one bucket floor(v/W), equi-join
  * on the bucket id, and verify the exact containment predicate on
  * the survivors. The join becomes a plain hash join with linear
  * candidate volume; expansion factor is len/W + 1 per interval, so
  * W is chosen near the TYPICAL interval length (W >> len degrades
  * toward all-pairs within a bucket; W << len explodes the interval
  * side — both still correct, only the constants move; Spark's own
  * storage-partitioned range-join work and DuckDB/Trino range-join
  * papers use exactly this binning).
  *
  * Inclusive on both ends; points matching no interval are dropped
  * (inner semantics); overlapping intervals yield one row per match.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, v: String,
                intervals: DataFrame, lo: String, hi: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ib = intervals.withColumn("bkt",
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    val pb = points.withColumn("bkt", floor(col(v) / bucketWidth).cast("long"))
    pb.join(ib, Seq("bkt"))
      .where(col(v) >= col(lo) && col(v) <= col(hi))
      .drop("bkt")
  }

  /** INTERVAL-OVERLAP JOIN — the two-sided sibling of [[rangeJoin]]:
    * match interval pairs (a, b) with `a.lo <= b.hi && b.lo <= a.hi`
    * (sessions × outage windows, ad slots × content segments, span
    * annotations × span annotations). Same bucket-expansion spine,
    * BOTH sides exploded; a pair whose intervals share k buckets
    * would surface k times from the equi-join, so each candidate is
    * kept only in the FIRST bucket both intervals cover —
    * `floor(max(lo_a, lo_b) / W)`, which every genuinely overlapping
    * pair covers on both sides by definition — making the dedup a
    * cheap scalar predicate instead of a distinct-shuffle.
    *
    * `equiKeys` are joined as additional hash keys (the per-user /
    * per-entity case); at 100 TB they are what keeps candidate volume
    * linear — a keyless overlap join over skewless data is fine, but
    * with keys the bucket explosion only meets rows of the same
    * entity. Caller renames value columns so the two sides are
    * disjoint apart from `equiKeys`. Inclusive touch (`a.hi == b.lo`
    * ⇒ overlap 0) matches the SQL `<=` form verbatim.
    */
  def intervalOverlapJoin(a: DataFrame, aLo: String, aHi: String,
                          b: DataFrame, bLo: String, bHi: String,
                          bucketWidth: Double,
                          equiKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def expand(df: DataFrame, lo: String, hi: String) =
      df.withColumn("bkt",
        explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    expand(a, aLo, aHi).join(expand(b, bLo, bHi), equiKeys :+ "bkt")
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .where(col("bkt") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("bkt")
  }
}
