package extractous.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.xbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable form per
  * Agarwal et al., "Mergeable Summaries", PODS 2012) over a token column:
  * each map partition keeps at most `cap` (token → counter) entries, partials
  * merge by counter sum followed by the subtract-the-(cap+1)-th-largest
  * shrink, and eval returns the surviving CANDIDATE tokens.
  *
  * Guarantee (one-sided, like the repo's Bloom/CMS sketches): every counter
  * undercounts its token's true frequency by at most N/(cap+1), so any token
  * with true frequency > N/(cap+1) is guaranteed present in the summary.
  * Candidates are a SUPERSET of the true heavy hitters; an exact second pass
  * over just the candidates ([[extractous.pipeline.CorpusStats.heavyHitters]])
  * turns them into an exact, deterministic answer — the summary's
  * partitioning-dependent extras are filtered out, so the operator's OUTPUT
  * is reproducible bit-for-bit at any parallelism even though the sketch
  * state is not.
  *
  * 100 TB shape: the naive vocabulary histogram shuffles one row per DISTINCT
  * token (crawl-scale vocabularies run to 10⁹⁺ with the long tail of typos
  * and junk); this exchange carries ONE ≤cap-entry summary per map partition
  * regardless of vocabulary size, and the verify pass shuffles only the ≤cap
  * candidate tokens.
  */
final case class MisraGriesTokens(
    tokExpr: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = Seq(tokExpr)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (tokExpr.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mg_tokens expects a STRING token, got ${tokExpr.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_tokens"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](cap * 2)

  override def update(buf: java.util.HashMap[String, Long], input: InternalRow): java.util.HashMap[String, Long] = {
    val t = tokExpr.eval(input)
    if (t != null) {
      val tok = t.asInstanceOf[UTF8String].toString
      val cur = buf.getOrDefault(tok, 0L)
      if (cur != 0L) buf.put(tok, cur + 1L)
      else if (buf.size < cap) buf.put(tok, 1L)
      else {
        // textbook MG overflow: decrement every counter, drop zeros — each
        // such O(cap) step retires cap+1 arrivals, so the amortized cost per
        // token stays O(1)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.put(e.getKey, buf.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (buf.size > cap) {
      // mergeable-summaries shrink: subtract the (cap+1)-th largest counter
      // from every entry and drop the non-positive — at most cap entries can
      // exceed that value, and each entry's total undercount stays ≤ N/(cap+1)
      val counts = new Array[Long](buf.size)
      var i = 0
      val ci = buf.values().iterator()
      while (ci.hasNext) { counts(i) = ci.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val v = counts(counts.length - 1 - cap) // (cap+1)-th largest
      val ei = buf.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= v) ei.remove() else e.setValue(e.getValue - v)
      }
    }
    buf
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    val entries = new Array[(Array[Byte], Long)](buf.size)
    var i = 0
    while (it0.hasNext) {
      val e = it0.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      entries(i) = (b, e.getValue)
      bytes += 4 + b.length + 8
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // deterministic candidate ORDER (the set itself is partitioning-dependent
    // by nature; the exact verify pass makes the operator output stable)
    val keys = new Array[String](buf.size)
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(k => UTF8String.fromString(k): Any))
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTokens =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTokens =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesTokens =
    copy(tokExpr = newChildren(0))
}

object mg {
  /** `mg_tokens(tok, cap)` → array<string> of Misra–Gries candidate tokens:
    * a superset of every token with frequency > N/(cap+1), from bounded
    * map-side summaries.
    */
  def mg_tokens(tok: Column, cap: Int): Column =
    ColumnBridge.column(
      MisraGriesTokens(ColumnBridge.expression(tok), cap).toAggregateExpression())
}
