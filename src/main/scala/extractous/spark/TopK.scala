package extractous.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.xbridge.ColumnBridge

/** Shared bounded-heap machinery for the two pair aggregates below: each map
  * partition keeps at most k (A, Long) pairs in a PriorityQueue whose HEAD is
  * the next eviction victim under `ordering`; partials merge by heap union;
  * (de)serialization is a flat 16-bytes-per-pair buffer. Subclasses own only
  * what genuinely differs — the element ordering, the update cast, and eval.
  */
private[spark] abstract class BoundedPairHeapAgg[A]
  extends TypedImperativeAggregate[java.util.PriorityQueue[(A, Long)]] {

  def k: Int

  /** Heap order: the head must be the pair to EVICT when size exceeds k. */
  protected def ordering: java.util.Comparator[(A, Long)]
  protected def writeFirst(bb: java.nio.ByteBuffer, a: A): Unit
  protected def readFirst(bb: java.nio.ByteBuffer): A

  override def createAggregationBuffer(): java.util.PriorityQueue[(A, Long)] =
    new java.util.PriorityQueue[(A, Long)](k + 1, ordering)

  protected final def offer(buf: java.util.PriorityQueue[(A, Long)], a: A, id: Long): Unit = {
    buf.offer((a, id))
    if (buf.size > k) { buf.poll(); () }
  }

  override def merge(buf: java.util.PriorityQueue[(A, Long)],
      other: java.util.PriorityQueue[(A, Long)]): java.util.PriorityQueue[(A, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (a, i) = it.next(); offer(buf, a, i) }
    buf
  }

  override def serialize(buf: java.util.PriorityQueue[(A, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (a, i) = it.next(); writeFirst(bb, a); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(A, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer((readFirst(bb), bb.getLong)); i += 1 }
    buf
  }
}

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
  *
  * Non-finite scores are DROPPED on update: `Double.compare` ranks NaN above
  * every real score, so a single NaN-scored row (e.g. a zero-norm or
  * corrupted embedding) would otherwise enter every heap, evict a genuine
  * k-th neighbor, and survive every merge — one poison row corrupting every
  * query's results corpus-wide.
  */
final case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends BoundedPairHeapAgg[Double] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  // analysis-time contract: a mistyped child fails the plan with a clear
  // message instead of throwing ClassCastException inside executors mid-job
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"topk_by_score expects (DOUBLE score, BIGINT id), got " +
        s"(${scoreExpr.dataType.sql}, ${idExpr.dataType.sql}) - cast before aggregating")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_by_score"

  // min-heap on (score asc, id desc): the head is the WORST kept candidate,
  // evicted when a better one arrives
  override protected def ordering: java.util.Comparator[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }

  override protected def writeFirst(bb: java.nio.ByteBuffer, a: Double): Unit = bb.putDouble(a)
  override protected def readFirst(bb: java.nio.ByteBuffer): Double = bb.getDouble

  override def update(buf: java.util.PriorityQueue[(Double, Long)], input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val score = s.asInstanceOf[Double]
      if (java.lang.Double.isFinite(score))
        offer(buf, score, i.asInstanceOf[Long])
    }
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
  extends BoundedPairHeapAgg[Long] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(pExpr, idExpr)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (pExpr.dataType == LongType && idExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kth_smallest_pair expects (BIGINT p, BIGINT id), got " +
        s"(${pExpr.dataType.sql}, ${idExpr.dataType.sql}) - cast before aggregating")
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("p", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))
  override def prettyName: String = "kth_smallest_pair"

  // max-heap on (p, id) lex: the head is the LARGEST kept pair, evicted
  // when a smaller one arrives
  override protected def ordering: java.util.Comparator[(Long, Long)] =
    (a: (Long, Long), b: (Long, Long)) => {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }

  override protected def writeFirst(bb: java.nio.ByteBuffer, a: Long): Unit = bb.putLong(a)
  override protected def readFirst(bb: java.nio.ByteBuffer): Long = bb.getLong

  override def update(buf: java.util.PriorityQueue[(Long, Long)], input: InternalRow): java.util.PriorityQueue[(Long, Long)] = {
    val p = pExpr.eval(input)
    val i = idExpr.eval(input)
    if (p != null && i != null)
      offer(buf, p.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Long, Long)]): Any = {
    if (buf.size < k) null
    else {
      val (p, id) = buf.peek() // heap head IS the k-th smallest
      InternalRow(p, id)
    }
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
