package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitters summary, capacity `m`.
  *
  * The exact `groupBy(key).count()` answer to "which keys dominate this
  * stream" shuffles one row PER DISTINCT KEY — at 100 TB with
  * billions of rare keys (URLs, n-grams, user ids) that is a
  * vocabulary-sized shuffle to answer a question whose answer has a
  * handful of rows. Misra–Gries keeps at most `m` counters per partial
  * buffer, so the map side reduces each task to <= m entries and the
  * final merge touches tasks x m counters — the shuffle is independent
  * of vocabulary size.
  *
  * Stream update (classic MG): tracked key -> count+1; untracked with
  * room -> insert at 1; untracked and full -> decrement ALL counters,
  * dropping zeros (each such step retires m+1 occurrences, which is the
  * amortized-O(1) and error-bound argument in one). Merge (Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS
  * 2012, Fig. 1): sum counters keywise, then subtract the (m+1)-th
  * largest combined count from every counter and drop the non-positive
  * remainder; the merged summary keeps the SAME worst-case error as a
  * single-pass summary over the concatenated stream.
  *
  * Contract over a stream of n items (any merge tree, any order):
  *   - est(x) <= true(x)                    (pure undercount), and
  *   - true(x) - est(x) <= n / (m + 1), so
  *   - every x with true(x) > n/(m+1) is PRESENT in the summary.
  * The estimates themselves depend on partition/merge order (which
  * decrements happen where), so the oracle-checked query verifies the
  * CONTRACT — presence + bracketing against exact in-plan counts —
  * exactly the approx-quantile rank-contract pattern, never the raw
  * counter values.
  *
  * Returns array<struct<key, est>> sorted (est desc, key asc).
  */
final class MgSummary(val m: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long]()

  def offer(key: String): Unit = {
    val c = counts.get(key)
    if (c != null) { counts.put(key, c + 1L); () }
    else if (counts.size < m) { counts.put(key, 1L); () }
    else {
      // decrement-all: the new key and one unit of every tracked key
      // annihilate together (m+1 occurrences per step)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Keywise-sum `other` in, then truncate back to capacity by the
    * PODS'12 rule: subtract the (m+1)-th largest count, drop <= 0.
    */
  def absorb(other: MgSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = counts.get(e.getKey)
      counts.put(e.getKey, if (c == null) e.getValue else c + e.getValue)
    }
    if (counts.size > m) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - (m + 1)) // (m+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= d) eit.remove() else e.setValue(e.getValue - d)
      }
    }
  }
}

case class MisraGries(key: Expression, m: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary] {
  require(m >= 1, "capacity m must be >= 1")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MgSummary = new MgSummary(m)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val k = key.eval(input)
    if (k != null) buf.offer(k.toString)
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.absorb(other); buf
  }

  override def eval(buf: MgSummary): Any = {
    val arr = buf.counts.entrySet().toArray(
      new Array[java.util.Map.Entry[String, java.lang.Long]](buf.counts.size))
    java.util.Arrays.sort(arr,
      (a: java.util.Map.Entry[String, java.lang.Long],
       b: java.util.Map.Entry[String, java.lang.Long]) => {
        val c = java.lang.Long.compare(b.getValue, a.getValue)
        if (c != 0) c else a.getKey.compareTo(b.getKey)
      })
    new GenericArrayData(arr.map(e =>
      InternalRow(UTF8String.fromString(e.getKey), e.getValue.longValue())))
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new MgSummary(m)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.counts.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0))
}
