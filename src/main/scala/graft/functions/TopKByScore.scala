package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-bounded top-k buffer: a worst-first binary heap whose root is
  * the entry a new candidate must beat. Order is (score desc, id asc)
  * for the RESULT, so the heap's internal comparator is its exact
  * inverse (score asc, id desc). `java.lang.Double.compare` ordering —
  * NaN greatest — matches Spark's double sort order, so a NaN score
  * (zero-norm corpus vector) ranks exactly where the window form
  * ranked it.
  */
final class TopKHeap(val k: Int) {
  val pq = new java.util.PriorityQueue[TopKHeap.Entry](math.max(k, 1), TopKHeap.WorstFirst)
  def offer(score: Double, id: Long): Unit =
    if (pq.size < k) { pq.add(new TopKHeap.Entry(score, id)); () }
    else {
      val w = pq.peek()
      // Double.compare throughout (r06 advice): a bare `score >
      // w.score` is false for a NaN candidate, which would silently
      // DROP it where Spark's `ORDER BY score DESC` ranks NaN first —
      // Double.compare orders NaN greatest, matching the window form
      // exactly (NaN case pinned in OperatorsSpec).
      val c = java.lang.Double.compare(score, w.score)
      if (c > 0 || (c == 0 && id < w.id)) {
        pq.poll(); pq.add(new TopKHeap.Entry(score, id)); ()
      }
    }
}

object TopKHeap {
  final class Entry(val score: Double, val id: Long)
  val WorstFirst: java.util.Comparator[Entry] =
    (a: Entry, b: Entry) => {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
}

/** Bounded per-group top-k as a partial-aggregable function — the
  * scale fix for the brute-force ANN faces (round-5 verdict #2).
  *
  * `row_number() OVER (PARTITION BY query_id)` sends EVERY scored
  * corpus row for a query to one partition before any of them can be
  * discarded — at the 10^12-vector scale the SQ8 face targets, that is
  * a per-query single-partition sort of the whole scored corpus. This
  * aggregate's partial buffers are capped at k entries, so the
  * map-side pass reduces each task's contribution to <= k rows per
  * query and the shuffle carries at most tasks x k x |queries| tiny
  * entries; the final merge is a k-way heap union per query. Identical
  * selection and order semantics to the window form ((score desc, id
  * asc), ties broken deterministically), pinned in OperatorsSpec.
  *
  * Returns array<struct<neighbor_id, score>> sorted best-first; the
  * caller posexplodes it, so ranks are position+1 — exactly the
  * row_number values.
  */
case class TopKByScore(score: Expression, id: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {
  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    val it = other.pq.iterator()
    while (it.hasNext) { val e = it.next(); buf.offer(e.score, e.id) }
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val arr = buf.pq.toArray(new Array[TopKHeap.Entry](buf.pq.size))
    java.util.Arrays.sort(arr, TopKHeap.WorstFirst.reversed()) // best-first
    new GenericArrayData(arr.map(e => InternalRow(e.id, e.score)))
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.pq.size * 16)
    bb.putInt(buf.pq.size)
    val it = buf.pq.iterator()
    while (it.hasNext) { val e = it.next(); bb.putDouble(e.score); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
