package extractous

import extractous.pipeline.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: the two-level prefix sum equals a plain-Scala global
  * cumsum for any block count (partition invariance), zero-token and
  * boundary-straddling documents land correctly, and the plan never
  * collapses to a single-partition window.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def refPack(rows: Seq[(Long, String)], seqLen: Int): Map[Long, (Long, Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, text) =>
      val n = text.trim.split("\\s+").count(_.nonEmpty).toLong
      val r = (id, (n, cum / seqLen, cum % seqLen, (cum + math.max(n, 1) - 1) / seqLen))
      cum += n
      r
    }.toMap
  }

  test("property: packing equals the reference cumsum for blocks = 1, 3, 32 on sparse ids") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    // sparse, shuffled ids: block assignment must not assume density
    val rows = rnd.shuffle((0 until 200).map(i => (i.toLong * 37 + (i % 5), Seq.fill(rnd.nextInt(40))("w" + rnd.nextInt(9)).mkString(" ")))).toSeq
    val ref = refPack(rows, 64)
    for (blocks <- Seq(1, 3, 32)) {
      val got = Packing.pack(rows.toDF("doc_id", "text"), "doc_id", "text", 64, blocks)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == ref, s"blocks=$blocks")
    }
  }

  test("zero-token and straddling documents: empty doc occupies nothing, long doc spans sequences") {
    import spark.implicits._
    val rows = Seq(
      (0L, Seq.fill(10)("a").mkString(" ")), // cum 0..9
      (1L, "   "),                           // zero tokens at cum=10
      (2L, Seq.fill(10)("b").mkString(" "))  // cum 10..19, straddles the 16-boundary
    )
    val got = Packing.pack(rows.toDF("doc_id", "text"), "doc_id", "text", 16)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0L) == ((10L, 0L, 0L, 0L)))
    assert(got(1L) == ((0L, 0L, 10L, 0L)))   // placed at offset 10, occupies nothing
    assert(got(2L) == ((10L, 0L, 10L, 1L)))  // tokens 10..19 span seq 0 and seq 1
  }

  test("auto blocks: default scales with input partitions and bounds rows per window partition") {
    import spark.implicits._
    val parts = 16
    val n = 3200
    val df = spark.sparkContext.parallelize((0 until n).map(i => (i.toLong, "a b c")), parts)
      .toDF("doc_id", "text")
    // default (blocks=0) must derive ≥ 4× the input partition count, so no
    // window partition can hold more than ~¼ of an input split's rows
    val expectedBlocks = math.max(32, 4 * df.rdd.getNumPartitions)
    val got = Packing.pack(df, "doc_id", "text", 64)
    // observe the block size pack actually chose via the plan's closed-form
    // literal: maxId=3199, blocks=64 → blockSize = (3199+64)/64 = 50 (a fixed
    // 32 would give 100) — so every window partition holds ≤ 50 dense ids
    val plan = got.queryExecution.analyzed.toString
    val expectedBlockSize = (n.toLong - 1 + expectedBlocks) / expectedBlocks
    assert(plan.contains(s"div cast($expectedBlockSize as bigint)"),
      s"expected auto-derived block size $expectedBlockSize in plan:\n$plan")
    // and the results still match the reference cumsum (blocks never change results)
    val ref = refPack((0 until n).map(i => (i.toLong, "a b c")), 64)
    val gotMap = got.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(gotMap == ref)
  }

  test("plan: the running sum is block-partitioned, never a single-partition window") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, "a b c")).toDF("doc_id", "text")
    val plan = Packing.pack(df, "doc_id", "text", 32).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"global-window shape would serialize the corpus through one task:\n$plan")
    assert(plan.contains("Window"), s"expected a partitioned window:\n$plan")
  }
}
