package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN — for each left row, the single most recent right row
  * with the same key and right.ts <= left.ts (inclusive). The
  * temporal-enrichment primitive (event -> last prior order, quote ->
  * last prior trade) that Spark has no built-in operator for.
  *
  * Implemented the scale-correct way (SURVEY §2.7's custom-operator
  * preference: compose existing ops before custom plans): a naive
  * `l.key = r.key AND r.ts <= l.ts` predicate + per-left argmax plans
  * a quadratic-per-key join; instead both sides are TAGGED and
  * UNIONED, shuffled ONCE on the key, and each left row picks up the
  * running `last(right cols, ignoreNulls)` over (ts, side, tiebreak)
  * row order — O(n log n) per key for the sort, one Exchange total,
  * no join at all.
  *
  * Tie rule, explicit and deterministic on both engines: a right row
  * at exactly left.ts IS visible (sides order right-before-left at
  * equal ts), and among right rows tied on ts the one with the
  * LARGEST `rightId` wins (rows sort ascending by id; the running
  * last overwrites). Left rows with no prior right row are dropped.
  *
  * Coercion contract (round-4 advice, explicit): both id columns are
  * cast to BIGINT and the carried right value to DOUBLE — the union
  * scan needs one common row shape across sides, and (long, double)
  * is it. Pointing the operator at a DECIMAL value column therefore
  * loses sub-double precision; carry exact decimals by pre-encoding
  * (e.g. the unscaled long) and decoding after the join. Exactly one
  * value column is carried; for several, pre-pack them into one
  * encodable column upstream.
  *
  * Skew: `asofJoin` sorts each key's FULL event+order history inside
  * one partition — one pathological key (a bot user holding most of
  * the corpus) serializes on a single task. `asofJoinBucketed` is the
  * skew-safe face: time is split into `nBuckets` ranges, the running
  * last is computed per (key, bucket), and a per-bucket carry-in
  * (the last right row of all EARLIER buckets, resolved on the tiny
  * keys x buckets summary) patches rows whose bucket holds no prior
  * right row. Same answer (pinned in OperatorsSpec on a one-hot-key
  * stress fixture); max task = hottest (key, bucket) instead of
  * hottest key.
  */
object AsOf {

  /** events(user_id, ts, event_id, ...) x orders-shaped right side.
    * Returns one row per left row that has a match: the left id cols
    * plus the as-of right id/value.
    */
  def asofJoin(left: DataFrame, leftKey: String, leftTs: String, leftId: String,
               right: DataFrame, rightKey: String, rightTs: String, rightId: String,
               rightVal: String): DataFrame = {
    val l = left.select(col(leftKey).as("k"), col(leftTs).as("ts"),
      col(leftId).cast("long").as("left_id"),
      lit(null).cast("long").as("r_id"), lit(null).cast("double").as("r_val"),
      lit(1).as("is_left"))
    val r = right.select(col(rightKey).as("k"), col(rightTs).as("ts"),
      lit(null).cast("long").as("left_id"),
      col(rightId).cast("long").as("r_id"), col(rightVal).cast("double").as("r_val"),
      lit(0).as("is_left"))
    // right rows sort before left rows at equal ts (inclusive <=);
    // right rows tied on ts sort by id ascending so the running last
    // keeps the largest id — the deterministic tie winner
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts").asc, col("is_left").asc, col("r_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // id and value carry as ONE struct, atomically: two independent
    // last(ignoreNulls) columns would decouple when the right VALUE is
    // null (id advancing to the newest row while the value stays from
    // an older one — a chimera of two right rows). The struct is null
    // exactly on left rows, so ignoreNulls skips them and a null
    // value INSIDE the newest right row carries through as null.
    val rStruct = when(col("is_left") === 0, struct(col("r_id"), col("r_val")))
    l.unionByName(r)
      .withColumn("asof", last(rStruct, ignoreNulls = true).over(w))
      .where(col("is_left") === 1 && col("asof").isNotNull)
      .select(col("left_id"), col("k"),
        col("asof.r_id").as("asof_id"), col("asof.r_val").as("asof_val"))
  }

  /** Skew-safe AS-OF: identical semantics to `asofJoin`, with the
    * per-key sort sharded into `nBuckets` time ranges so a hot key's
    * history spreads over `nBuckets` tasks.
    *
    * Three stages, all linear: (1) the same union scan windowed by
    * (k, bkt) — the big exchange now keys on (key, time-bucket);
    * (2) a per-(k, bkt) summary (one row each) whose running last
    * across BUCKET order yields each bucket's carry-in — the last
    * right row strictly before the bucket's range; (3) a join of the
    * carry-in back onto left rows on (k, bkt) — the partitioning the
    * window just produced — `coalesce`-ing the within-bucket running
    * last with the carry-in. Bucket ranges
    * are derived from the observed [min, max] ts (one scalar agg over
    * the union — at 100 TB this is a map-side-combined 2-value
    * reduction, or pass a known calendar range to skip it).
    */
  def asofJoinBucketed(left: DataFrame, leftKey: String, leftTs: String, leftId: String,
                       right: DataFrame, rightKey: String, rightTs: String, rightId: String,
                       rightVal: String, nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val l = left.select(col(leftKey).as("k"), col(leftTs).cast("timestamp").as("ts"),
      col(leftId).cast("long").as("left_id"),
      lit(null).cast("long").as("r_id"), lit(null).cast("double").as("r_val"),
      lit(1).as("is_left"))
    val r = right.select(col(rightKey).as("k"), col(rightTs).cast("timestamp").as("ts"),
      lit(null).cast("long").as("left_id"),
      col(rightId).cast("long").as("r_id"), col(rightVal).cast("double").as("r_val"),
      lit(0).as("is_left"))
    // the tagged union feeds three consumers (the [min,max] range agg,
    // the windowed scan, the per-bucket finals agg); deliberately NOT
    // checkpointed (r07 measured it): each consumer's column-pruned
    // re-scan of the two source tables is cheaper than materializing
    // and re-reading the full union at every scale
    val u0 = l.unionByName(r).withColumn("tsu", unix_micros(col("ts")))
    val mmRow = u0.agg(min(col("tsu")), max(col("tsu"))).head()
    // empty input, or every ts NULL (min skips nulls): constants are
    // arbitrary then — null-ts rows land in the NULL bucket, which
    // sorts first in both windows, reproducing asofJoin's NULLS FIRST
    // order exactly (review round-5: an early empty return here
    // diverged from asofJoin on the all-null corner)
    val (tsMin, tsMax) =
      if (mmRow.isNullAt(0)) (0L, 0L) else (mmRow.getLong(0), mmRow.getLong(1))
    val width = math.max(1L, (tsMax - tsMin) / nBuckets + 1L)
    val u = u0.withColumn("bkt", ((col("tsu") - lit(tsMin)) / lit(width)).cast("long"))

    val rStruct = when(col("is_left") === 0, struct(col("r_id"), col("r_val")))
    val wRun = Window.partitionBy(col("k"), col("bkt"))
      .orderBy(col("ts").asc, col("is_left").asc, col("r_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = u.withColumn("run", last(rStruct, ignoreNulls = true).over(wRun))

    // per-(k, bkt) final right struct -> carry-in = last non-null
    // final over STRICTLY EARLIER buckets of the same key (tiny table:
    // |keys| x nBuckets rows at most). The bucket's final equals the
    // max-(ts, r_id) RIGHT row of the bucket (left rows never carry) —
    // stated as a CONDITIONAL max_by so one partial-aggregated groupBy
    // over the union yields BOTH the final and a summary row for every
    // populated cell. Both halves matter: deriving finals from
    // `scanned` re-evaluates the whole union window (plan audit round
    // 5: column pruning defeats subplan reuse), and aggregating the
    // right side ALONE drops left-only buckets from the carry table —
    // with disjoint time ranges (orders years before events) every
    // left row then missed its carry-in and the join returned empty.
    val finals = u
      .groupBy(col("k"), col("bkt"))
      .agg(max_by(when(col("is_left") === 0, struct(col("r_id"), col("r_val"))),
        when(col("is_left") === 0, struct(col("ts"), col("r_id")))).as("fin"))
    val wCarry = Window.partitionBy(col("k")).orderBy(col("bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = finals
      .withColumn("carry_in", last(col("fin"), ignoreNulls = true).over(wCarry))
      .select(col("k"), col("bkt"), col("carry_in"))

    // no broadcast hint: carry is |keys| x nBuckets rows — small for
    // hot-key workloads but NOT broadcastable at 10^9 keys. The join
    // keys on (k, bkt), the same partitioning the window just
    // produced, so the big side needs no new exchange; AQE broadcasts
    // the summary side when it actually is small.
    scanned.where(col("is_left") === 1)
      .join(carry, Seq("k", "bkt"), "left")
      .withColumn("asof", coalesce(col("run"), col("carry_in")))
      .where(col("asof").isNotNull)
      .select(col("left_id"), col("k"),
        col("asof.r_id").as("asof_id"), col("asof.r_val").as("asof_val"))
  }

  /** DuckDB oracle: the same spec stated as an explicit argmax (NOT
    * DuckDB's ASOF JOIN operator, whose equal-ts tie pick is
    * unspecified — the QUALIFY form pins ts DESC then id DESC, exactly
    * the union-scan's winner).
    */
  def asofOracleSql(leftRel: String, leftKey: String, leftTs: String, leftId: String,
                    rightRel: String, rightKey: String, rightTs: String, rightId: String,
                    rightVal: String): String =
    s"""SELECT l.$leftId AS left_id, l.$leftKey AS k,
       |  CAST(r.$rightId AS BIGINT) AS asof_id, CAST(r.$rightVal AS DOUBLE) AS asof_val
       |FROM $leftRel l JOIN $rightRel r
       |  ON r.$rightKey = l.$leftKey AND r.$rightTs <= l.$leftTs
       |QUALIFY row_number() OVER (PARTITION BY l.$leftId
       |  ORDER BY r.$rightTs DESC, r.$rightId DESC) = 1""".stripMargin
}
