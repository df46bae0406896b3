package extractous

import extractous.pipeline.Cms
import extractous.spark.CmsKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count–Min phrase-frequency sketch: kernel vs a plain-Scala reference
  * (kernel-twin rule), the one-sided overcount guarantee against exact
  * counts, end-to-end build + probe agreement, and the bounded-exchange
  * build / zero-exchange probe plans.
  */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Mod = 1000000007L
  // independent reference formulation — no kernel code reused
  private def refPoly(s: String): Long =
    s.codePoints.toArray.foldLeft(0L)((a, c) => (a * 31 + c) % Mod)
  private def refGram(w1: String, w2: String): Long =
    (refPoly(w1) * 131 + refPoly(w2)) % Mod
  private def refSlots(tokens: Seq[String], w: Int): Seq[Long] =
    tokens.zip(tokens.drop(1)).flatMap { case (a, b) =>
      val g = refGram(a, b)
      Seq((31L, 7L), (131L, 77L), (1009L, 777L), (9176L, 7777L)).zipWithIndex
        .map { case ((ka, kb), j) => j.toLong * w + ((g * ka + kb) % Mod) % w }
    }

  test("property: kernel slots equal the reference on random token arrays") {
    val rnd = new scala.util.Random(2005)
    val vocab = Vector("alpha", "beta", "gamma", "δέλτα", "e5", "", "longer-token-ω")
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(6)
      val toks = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      val got = CmsKernel.slots(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any]),
        1024).toLongArray().toSeq
      assert(got == refSlots(toks, 1024), s"tokens=$toks")
    }
  }

  test("guarantee: estimate >= exact count for every bigram, exact at low load") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val words = Vector("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
      "alpha", "beta", "gamma", "delta")
    val docs = (1 to 150).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    // exact bigram counts from the raw token streams
    val exact = docs.flatMap { case (_, t) =>
      val ts = t.split("\\s+").toSeq
      ts.zip(ts.drop(1))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // heavily-loaded sketch: overcounts appear but never undercounts
    val tight = Cms.build(df, "text", w = 64)
    // lightly-loaded sketch: min-over-4-rows recovers the exact count
    val roomy = Cms.build(df, "text", w = 4096)
    exact.foreach { case ((w1, w2), n) =>
      val g = refGram(w1, w2)
      val estTight = CmsKernel.estimate(g, tight.counters, tight.w)
      val estRoomy = CmsKernel.estimate(g, roomy.counters, roomy.w)
      assert(estTight >= n, s"CMS must never undercount: ($w1,$w2) exact=$n est=$estTight")
      assert(estRoomy == n, s"unloaded sketch should be exact: ($w1,$w2) exact=$n est=$estRoomy")
    }
    // an absent phrase may only collide upward, never fabricate a negative
    assert(CmsKernel.estimate(refGram("absent", "phrase"), roomy.counters, roomy.w) >= 0)
  }

  test("end-to-end: estimatePhrases over discovered candidates matches the kernel") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"),
      (2L, "a b x"),
      (3L, ""),      // no grams
      (4L, "solo")   // single token: no grams
    ).toDF("doc_id", "text")
    val sk = Cms.build(df, "text", w = 1024)
    val cands = Cms.candidateBigrams(df, "text")
    val got = Cms.estimatePhrases(cands, "w1", "w2", sk)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // candidates: (a,b)×3, (b,a)×1, (b,c)×1, (a,b from doc2 dup), (b,x)×1
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("b", "c"), ("b", "x")))
    assert(got(("a", "b")) == 3L)
    assert(got(("b", "a")) == 1L)
    got.foreach { case ((w1, w2), est) =>
      assert(est == CmsKernel.estimate(refGram(w1, w2), sk.counters, sk.w))
    }
  }

  test("plans: build exchanges only bounded slot counts; probe is zero-exchange") {
    import spark.implicits._
    val df = (1 to 60).map(i => (i.toLong, s"tok${i % 5} tok${i % 7} tok${i % 3}"))
      .toDF("doc_id", "text")
    val buildPlan = df
      .select(explode(extractous.spark.cms.cms_slots(
        extractous.pipeline.TextStats.gramTokens(col("text")), 1024)).as("slot"))
      .groupBy("slot").count()
      .queryExecution.executedPlan.toString
    // ONE exchange, fed by a map-side partial aggregate over the bounded
    // slot key space — the build's shuffle cost is 4·W rows per partition,
    // not a function of the corpus size
    assert("Exchange hashpartitioning".r.findAllIn(buildPlan).size == 1, buildPlan)
    assert(buildPlan.contains("partial_count") || buildPlan.contains("Partial"),
      s"slot counts must combine map-side:\n$buildPlan")

    val sk = Cms.build(df, "text", w = 1024)
    val probePlan = Cms.estimatePhrases(
      Seq(("tok1", "tok2")).toDF("w1", "w2"), "w1", "w2", sk)
      .queryExecution.executedPlan.toString
    assert(!probePlan.contains("Exchange"), s"probe must stay narrow:\n$probePlan")
  }
}
