package extractous

import extractous.pipeline.QualityTrain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-perceptron quality classifier: hand-checked updates, separable-data
  * convergence with early stop, partitioning determinism, and the
  * model-sized-exchange plan shape.
  */
class QualityTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def featFrame(rows: Seq[(Long, Long, Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "y", "x1", "x2", "x3")
  }

  test("one iteration from zero weights misclassifies everything (margin 0) and sums y·x") {
    // rows: (+1, [2,0,1]), (-1, [0,3,1]) → grad = (0, 2, -3, 0); bias grad = 1-1 = 0
    val f = featFrame(Seq((0L, 1L, 2L, 0L, 1L), (1L, -1L, 0L, 3L, 1L)))
    val w = QualityTrain.train(f, iters = 1)
    assert(w.toSeq == Seq(0L, 2L, -3L, 0L))
  }

  test("separable data converges and the early-stop leaves later iterations at the fixed point") {
    // digit-heavy junk (x1 large) vs prose (x1 = 0): one update separates
    val rows = (0 until 40).map { i =>
      if (i % 4 == 0) (i.toLong, -1L, 120L + i % 3, 5L, 0L)
      else (i.toLong, 1L, 0L, 5L, 30L)
    }
    val f = featFrame(rows)
    val w8 = QualityTrain.train(f, iters = 8)
    val w20 = QualityTrain.train(f, iters = 20)
    assert(w8.toSeq == w20.toSeq, "converged weights must not drift with extra iterations")
    val preds = f.select(col("y"), QualityTrain.scoreCol(w8).as("s")).collect()
    assert(preds.forall(r => r.getLong(0) * r.getLong(1) > 0), "all rows correctly classified")
  }

  test("training is deterministic across partitioning (integer sums commute)") {
    val rows = (0 until 200).map { i =>
      if (i % 5 == 0) (i.toLong, -1L, 100L + i % 7, 4L + i % 3, 0L)
      else (i.toLong, 1L, i % 2L, 5L + i % 4, 20L + i % 9)
    }
    val a = QualityTrain.train(featFrame(rows).repartition(1), 8)
    val b = QualityTrain.train(featFrame(rows).repartition(13), 8)
    assert(a.toSeq == b.toSeq)
  }

  test("plan shape: the gradient aggregation is ONE exchange with map-side partials") {
    val f = featFrame(Seq((0L, 1L, 2L, 0L, 1L), (1L, -1L, 0L, 3L, 1L)))
    val w = Array(1L, 2L, 3L, 4L)
    val miss = col("y") * QualityTrain.scoreCol(w) <= 0
    val agg = f.agg(
      sum(when(miss, col("y")).otherwise(lit(0L))).as("d0"),
      sum(when(miss, col("y") * col("x1")).otherwise(lit(0L))).as("d1"))
    val plan = agg.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("partial_sum") || plan.toLowerCase.contains("partial"), plan)
  }

  test("feature kernel: densities are exact integer divisions") {
    import spark.implicits._
    val df = Seq("a1b2 the cat", "999 888 777").toDF("text")
    val got = df.select(QualityTrain.features(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // "a1b2 the cat": chars=12 digits=2 words=3 the=1 → x1=(2*256)/12=42, x2=4, x3=256/3=85
    assert(got(0) == ((42L, 4L, 85L)))
    // "999 888 777": chars=11 digits=9 words=3 the=0 → x1=(9*256)/11=209, x2=3, x3=0
    assert(got(1) == ((209L, 3L, 0L)))
  }
}
