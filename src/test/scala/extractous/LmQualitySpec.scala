package extractous

import extractous.pipeline.LmQuality
import extractous.spark.LmKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CCNet-style LM quality bucketing: kernel vs a plain-Scala reference
  * formulation (the repo's kernel-twin rule), model-count correctness,
  * tercile semantics incl. tie and tiny-corpus edges, fluency separation
  * (word salad scores above trusted prose), and the plan-shape guarantee
  * (narrow zero-exchange scoring).
  */
class LmQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Mod = 1000000007L

  // independent reference: idiomatic collections, no shared code with the kernel
  private def refPoly(s: String): Long =
    s.codePoints.toArray.foldLeft(0L)((a, c) => (a * 31 + c) % Mod)
  private def refBuckets(tokens: Seq[String], b: Int): Seq[Long] = {
    val hs = tokens.map(refPoly)
    hs.sliding(2).collect { case Seq(x, y) =>
      Seq(x % b, b + ((x * 131 + y) % Mod) % b)
    }.toSeq.flatten
  }
  private def refLog(x: Long): Long = {
    val m = math.min(x + 1, 131072L)
    (BigInt(m) * m * m).bitLength - 1L
  }
  private def refSurprise(tokens: Seq[String], model: Array[Long]): Long = {
    val b = model.length / 2
    val hs = tokens.map(refPoly)
    if (hs.length < 2) return 0L
    val terms = hs.sliding(2).collect { case Seq(x, y) =>
      val cu = model((x % b).toInt)
      val cb = model((b + ((x * 131 + y) % Mod) % b).toInt)
      if (cu == 0L) 51L else refLog(cu) - refLog(cb)
    }.toSeq
    64L * terms.sum / terms.length
  }

  test("property: kernel buckets and surprise equal the reference on 200 random token sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(417)
    val words = Seq("alpha", "beta", "gamma", "δelta", "ε", "zz9", "", "longerword")
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val b = 256
    val model = Array.tabulate(2 * b)(i => if (i % 7 == 0) 0L else (i % 97).toLong)
    val got = rows.toDF("id", "text")
      .select(col("id"),
        extractous.spark.lm.lm_buckets(split(trim(col("text")), "\\s+"), b).as("bk"),
        extractous.spark.lm.lm_surprise(split(trim(col("text")), "\\s+"), model).as("sc"))
      .collect()
    got.foreach { r =>
      val toks = rows(r.getLong(0).toInt)._2.trim.split("\\s+").toSeq
      assert(r.getSeq[Long](1) == refBuckets(toks, b), s"buckets id=${r.getLong(0)}")
      assert(r.getLong(2) == refSurprise(toks, model), s"surprise id=${r.getLong(0)}")
    }
  }

  test("model counts only the trusted subset and returns the full corpus count") {
    import spark.implicits._
    val df = Seq(
      (0L, "the cat sat", "en"),
      (1L, "le chat noir", "fr"),
      (2L, "the cat ran", "en")
    ).toDF("doc_id", "text", "lang")
    val b = 64
    val (counts, total) = LmQuality.model(df, "text", col("lang") === "en", b)
    assert(total == 3L)
    val ref = new Array[Long](2 * b)
    Seq("the cat sat", "the cat ran").foreach { t =>
      refBuckets(t.split("\\s+").toSeq, b).foreach(g => ref(g.toInt) += 1)
    }
    assert(counts.toSeq == ref.toSeq)
  }

  test("bucketed: trusted-style prose lands in head, word salad in tail; terciles honor ties") {
    import spark.implicits._
    // 6 fluent docs repeating the trusted pattern, 3 salads with unseen contexts
    val fluent = (0L until 6L).map(i => (i, "the cat sat on the mat", "en"))
    val salad = (6L until 9L).map(i => (i, s"zzq$i qqz${i * 7} xx${i * 13} zzq${i + 1}", "xx"))
    val df = (fluent ++ salad).toDF("doc_id", "text", "lang")
    val out = LmQuality.bucketed(df, "doc_id", "text", col("lang") === "en", b = 512)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // N=9 → k1=3, k2=6; the 6 fluent docs share one (low) score, so the tie
    // keeps them together: all 6 are head (cum at their score ≥ 3), salads tail
    (0L until 6L).foreach(i => assert(out(i) == "head", s"doc $i"))
    (6L until 9L).foreach(i => assert(out(i) == "tail", s"doc $i"))
  }

  test("bucketed edge: N=1 corpus is all tail, N=2 has no head") {
    import spark.implicits._
    val one = Seq((0L, "just one", "en")).toDF("doc_id", "text", "lang")
    assert(LmQuality.bucketed(one, "doc_id", "text", col("lang") === "en", b = 64)
      .collect().map(_.getString(2)).toSeq == Seq("tail"))
    val two = Seq((0L, "a b", "en"), (1L, "zz qq", "xx")).toDF("doc_id", "text", "lang")
    val got = LmQuality.bucketed(two, "doc_id", "text", col("lang") === "en", b = 64)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // k1=0 (no head), k2=1: the lower-surprise doc is middle, the other tail
    assert(got(0L) == "middle" && got(1L) == "tail")
  }

  test("null text rows count toward N and score 0 — no crash, no silent row loss") {
    import spark.implicits._
    val df = Seq(
      (0L, Option("the cat sat"), "en"),
      (1L, None: Option[String], "en"),
      (2L, Option("the cat sat"), "en")
    ).toDF("doc_id", "text", "lang")
    val (_, total) = LmQuality.model(df, "text", col("lang") === "en", b = 64)
    assert(total == 3L, "the null row must still count toward the corpus size")
    val out = LmQuality.bucketed(df, "doc_id", "text", col("lang") === "en", b = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 3)
    assert(out.find(_._1 == 1L).get._2 == 0L, "null text scores as the empty document")
  }

  test("plan: scoring is a narrow zero-exchange projection") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, s"w$i w${i + 1} w$i")).toDF("doc_id", "text")
    val plan = LmQuality.scored(df, "doc_id", "text", new Array[Long](128))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"LM scoring must be narrow:\n$plan")
  }
}
