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
