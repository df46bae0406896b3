package extractous

import extractous.pipeline.{BpeModel, BpeTrain}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer training: hand-checked merges, frequency weighting,
  * overlap semantics, partitioning determinism, the vocab cap, agreement
  * with the frozen BpeModel trainer under uniform weights, and the
  * 100-TB plan shape (map-side combined count, top-V without a global
  * sort).
  */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hand-checked greedy merges with frequency weighting") {
    // counts: "abab"×3, "ab"×2 → pairs: (a,b)=3·2+2=8, (b,a)=3 → merge 1 = (a,b) count 8
    // after: abab=[ab,ab], ab=[ab] → pairs: (ab,ab)=3 → merge 2 = (ab,ab) count 3
    val m = BpeTrain.trainFromCounts(Array("abab" -> 3L, "ab" -> 2L), numMerges = 5)
    assert(m.map(x => (x.rank, x.left, x.right, x.pairCount)) ==
      Vector((1, "a", "b", 8L), (2, "ab", "ab", 3L)))
  }

  test("weighting matters: flipping counts flips the first merge") {
    val m1 = BpeTrain.trainFromCounts(Array("xy" -> 5L, "yz" -> 2L), 1)
    val m2 = BpeTrain.trainFromCounts(Array("xy" -> 2L, "yz" -> 5L), 1)
    assert(m1.head.left == "x" && m1.head.right == "y")
    assert(m2.head.left == "y" && m2.head.right == "z")
  }

  test("tie-break is lexicographic on (left, right)") {
    val m = BpeTrain.trainFromCounts(Array("zy" -> 3L, "ab" -> 3L), 1)
    assert((m.head.left, m.head.right) == ("a", "b"))
  }

  test("overlap semantics: 'aaaa' counts 3 (a,a) pairs, merges to [aa,aa]") {
    val m = BpeTrain.trainFromCounts(Array("aaaa" -> 1L), 2)
    assert(m(0) == BpeTrain.Merge(1, "a", "a", 3L))
    // after merge 1: [aa, aa] → pair (aa,aa) once
    assert(m(1) == BpeTrain.Merge(2, "aa", "aa", 1L))
  }

  test("stops early when every word is a single symbol") {
    val m = BpeTrain.trainFromCounts(Array("ab" -> 1L), 100)
    assert(m.length == 1)
  }

  test("uniform weights reproduce the frozen BpeModel merge sequence") {
    val wc = BpeModel.trainWords.map(_ -> 1L).toArray
    val got = BpeTrain.trainFromCounts(wc, 20).map(m => (m.left, m.right))
    assert(got == BpeModel.merges.take(20).toVector)
  }

  test("training is deterministic across input partitioning") {
    import spark.implicits._
    val texts = (0 until 200).map(i => s"spark filter join order row$i value data")
    val a = BpeTrain.train(texts.toDF("text").repartition(1), col("text"), 8).collect().toSeq
    val b = BpeTrain.train(texts.toDF("text").repartition(17), col("text"), 8).collect().toSeq
    assert(a == b)
  }

  test("maxVocab cap keeps top-V by (count desc, word)") {
    import spark.implicits._
    val df = Seq.fill(5)("big big big small").toDF("text")
    val wc = BpeTrain.wordCounts(df, col("text"), maxVocab = 1)
    assert(wc.toSeq == Seq("big" -> 15L))
  }

  test("plan shape: partial+final hash aggregate around ONE exchange; top-V is TakeOrdered") {
    import spark.implicits._
    val df = Seq("a b c", "b c d").toDF("text")
    val counted = df
      .select(explode(split(trim(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(10)
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one exchange, plan:\n$plan")
  }
}
