package extractous.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.xbridge.ColumnBridge

/** Bounded top-k aggregate over (score, id) pairs: each partition keeps at
  * most k candidates in a heap (map-side partial aggregation), partials merge
  * by heap union, and the final value is the k best ids sorted by
  * (score desc, id asc).
  *
  * This is the scale-correct physical shape for brute-force kNN: the
  * alternative — `row_number() OVER (PARTITION BY query)` — must shuffle and
  * sort EVERY scored (query, candidate) row (|Q|·|C| rows through the
  * exchange), whereas the partial aggregate reduces each map partition to
  * |Q|·k rows before any shuffle. Ties break on id ascending, so results are
  * deterministic and oracle-comparable.
  */
final case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_by_score"

  // min-heap on (score asc, id desc): the head is the WORST kept candidate,
  // evicted when a better one arrives
  private def ordering: java.util.Comparator[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, ordering)

  private def offer(buf: java.util.PriorityQueue[(Double, Long)], score: Double, id: Long): Unit = {
    buf.offer((score, id))
    if (buf.size > k) { buf.poll(); () }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long)], input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      offer(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Double, Long)], other: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i) = it.next(); offer(buf, s, i) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // final order: best first — score desc, id asc
    val sorted = arr.sortBy(t => (-t._1, t._2))
    new GenericArrayData(sorted.map(_._2))
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

/** The k-th smallest (p, id) pair per group under lexicographic order, or
  * null when the group holds fewer than k rows — the threshold half of the
  * per-domain cap: each map partition keeps a bounded max-heap of its k
  * smallest pairs, partials merge by heap union, so the exchange carries at
  * most k 16-byte pairs per (group × partition) no matter how hot the group.
  * The alternative — `row_number() OVER (PARTITION BY domain)` — shuffles and
  * sorts every row of the hottest domain into one task, the exact skew this
  * shape exists to avoid.
  */
final case class KthSmallestPair(
    pExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Long, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(pExpr, idExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("p", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))
  override def prettyName: String = "kth_smallest_pair"

  // max-heap on (p, id) lex: the head is the LARGEST kept pair, evicted
  // when a smaller one arrives
  private def ordering: java.util.Comparator[(Long, Long)] =
    (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Long, Long)] =
    new java.util.PriorityQueue[(Long, Long)](k + 1, ordering)

  private def offer(buf: java.util.PriorityQueue[(Long, Long)], p: Long, id: Long): Unit = {
    buf.offer((p, id))
    if (buf.size > k) { buf.poll(); () }
  }

  override def update(buf: java.util.PriorityQueue[(Long, Long)], input: InternalRow): java.util.PriorityQueue[(Long, Long)] = {
    val p = pExpr.eval(input)
    val i = idExpr.eval(input)
    if (p != null && i != null)
      offer(buf, p.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Long, Long)], other: java.util.PriorityQueue[(Long, Long)]): java.util.PriorityQueue[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (p, i) = it.next(); offer(buf, p, i) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Long, Long)]): Any = {
    if (buf.size < k) null
    else {
      val (p, id) = buf.peek() // heap head IS the k-th smallest
      InternalRow(p, id)
    }
  }

  override def serialize(buf: java.util.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (p, i) = it.next(); bb.putLong(p); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KthSmallestPair =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KthSmallestPair =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KthSmallestPair =
    copy(pExpr = newChildren(0), idExpr = newChildren(1))
}

object topk {
  /** `topk_by_score(score, id, k)` → array<bigint> of the k ids with the
    * highest scores (ties on id asc), computed with map-side partial top-k.
    */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** `kth_smallest_pair(p, id, k)` → struct(p, id) of the k-th smallest
    * (p, id) pair under lexicographic order, null when the group has fewer
    * than k rows; map-side partial bounded heaps.
    */
  def kth_smallest_pair(p: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      KthSmallestPair(ColumnBridge.expression(p), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
