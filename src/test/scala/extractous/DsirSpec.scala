package extractous

import extractous.pipeline.Dsir
import extractous.spark.DsirKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR-style importance selection: kernel vs a plain-Scala reference
  * formulation (the repo's kernel-twin rule), fixed-point log exactness,
  * end-to-end selection semantics, and the plan-shape guarantees (no
  * window, no sort-merge join, narrow scoring).
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Mod = 1000000007L

  // independent reference: idiomatic collections, no shared code with the kernel
  private def refPoly(s: String): Long =
    s.codePoints.toArray.foldLeft(0L)((a, c) => (a * 31 + c) % Mod)
  private def refBuckets(tokens: Seq[String], b: Int): Seq[Long] = {
    val hs = tokens.map(refPoly)
    hs.map(_ % b) ++ hs.sliding(2).collect { case Seq(x, y) => ((x * 131 + y) % Mod) % b }.toSeq
  }
  private def refScore(tokens: Seq[String], lambda: Array[Long]): Long = {
    val g = refBuckets(tokens, lambda.length)
    if (g.isEmpty) 0L else 64L * g.map(x => lambda(x.toInt)).sum / g.length
  }

  test("flog2cube is the exact integer floor(log2(min(x+1,2^17)^3))") {
    for (x <- Seq(0L, 1L, 2L, 3L, 6L, 7L, 63L, 64L, 1000L, 131071L, 131072L, Long.MaxValue / 2)) {
      val m = math.min(x + 1, 131072L)
      val expect = (BigInt(m) * m * m).bitLength - 1
      assert(DsirKernel.flog2cube(x) == expect, s"x=$x")
    }
  }

  test("property: kernel buckets and score equal the reference on 200 random token sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(91)
    val words = Seq("alpha", "beta", "gamma", "δelta", "ε", "zz9", "", "a b") // incl. non-ASCII + empty
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(30)
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.length - 1))).mkString(" "))
    }
    val b = 512
    val lambda = Array.tabulate(b)(i => (i % 13).toLong - 6)
    val df = rows.toDF("id", "text")
      .select(col("id"),
        extractous.spark.dsir.dsir_buckets(split(trim(col("text")), "\\s+"), b).as("bk"),
        extractous.spark.dsir.dsir_score(split(trim(col("text")), "\\s+"), lambda).as("sc"))
      .collect()
    df.foreach { r =>
      val toks = rows(r.getLong(0).toInt)._2.trim.split("\\s+").toSeq
      assert(r.getSeq[Long](1) == refBuckets(toks, b), s"buckets id=${r.getLong(0)}")
      assert(r.getLong(2) == refScore(toks, lambda), s"score id=${r.getLong(0)}")
    }
  }

  test("profiles: one-scan conditional counts match per-subset recounts") {
    import spark.implicits._
    val df = Seq(
      (0L, "good text good", "en"),
      (1L, "mauvais texte", "fr"),
      (2L, "good good", "en")
    ).toDF("doc_id", "text", "lang")
    val b = 64
    val (src, tgt) = Dsir.profiles(df, "text", col("lang") === "en", b)
    // reference recount
    val rs = new Array[Long](b); val rt = new Array[Long](b)
    Seq(("good text good", true), ("mauvais texte", false), ("good good", true)).foreach {
      case (t, isT) => refBuckets(t.split("\\s+").toSeq, b).foreach { g =>
        rs(g.toInt) += 1; if (isT) rt(g.toInt) += 1
      }
    }
    assert(src.toSeq == rs.toSeq)
    assert(tgt.toSeq == rt.toSeq)
  }

  test("selectTopK flags exactly k docs, prefers the target distribution, ties on id") {
    import spark.implicits._
    val df = ((0 until 20).map(i => (i.toLong, "apple banana apple cherry", "t")) ++
      (20 until 40).map(i => (i.toLong, "rock stone pebble boulder", "s"))).toDF("doc_id", "text", "lang")
    val out = Dsir.selectTopK(df, "doc_id", "text", col("lang") === "t", k = 10)
      .orderBy("doc_id").collect()
    val selected = out.filter(_.getLong(2) == 1L).map(_.getLong(0)).toSeq
    assert(selected.length == 10)
    // all target-phrased docs outscore the source-only phrasing; tie-break id asc
    assert(selected == (0L until 10L))
    // scores: identical text → identical score
    val scores = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 20).map(i => scores(i.toLong)).distinct.size == 1)
    assert(scores(0L) > scores(25L))
  }

  test("k larger than the corpus selects everything (null threshold path)") {
    import spark.implicits._
    val df = Seq((1L, "a b", "x"), (2L, "c d", "x")).toDF("doc_id", "text", "lang")
    val out = Dsir.selectTopK(df, "doc_id", "text", col("lang") === "x", k = 10).collect()
    assert(out.forall(_.getLong(2) == 1L))
  }

  test("plan shape: scoring is narrow (no exchange), selection has no window/sort-merge") {
    import spark.implicits._
    val df = Seq((1L, "a b c", "x")).toDF("doc_id", "text", "lang")
    val lambda = new Array[Long](64)
    val scorePlan = Dsir.scored(df, "doc_id", "text", lambda)
      .queryExecution.executedPlan.toString
    assert(!scorePlan.contains("Exchange"), s"scoring must not shuffle:\n$scorePlan")
    val selPlan = Dsir.selectTopK(df, "doc_id", "text", col("lang") === "x", k = 5)
      .queryExecution.executedPlan.toString
    assert(!selPlan.contains("Window"), s"no row_number window:\n$selPlan")
    assert(!selPlan.contains("SortMergeJoin"), s"threshold must broadcast:\n$selPlan")
  }
}
