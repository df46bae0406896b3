package extractous

import extractous.pipeline.{Dedup, Multimodal, Similarity, TextStats}
import extractous.gen.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("exact dedup halves a doubled corpus") {
    val d = docs.select(col("doc_id"), col("text"))
    val doubled = d.union(d.select(col("doc_id") + 100000, col("text")))
    val out = Dedup.exact(doubled, "text", "doc_id")
    assert(out.count() == 500)
    assert(out.agg(sum("cnt")).head.getLong(0) == 1000)
    assert(out.agg(max("keep_id")).head.getLong(0) < 100000) // representative = original
  }

  test("minhash signature similarity tracks jaccard") {
    import spark.implicits._
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute-force truth via the same shingle/jaccard expressions
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text")).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .filter(col("j") >= 0.8).select("a.id", "b.id").as[(Long, Long)].collect().toSet
    assert(pairs == truth)
    assert(truth.nonEmpty) // the seed corpus has natural near-dups
  }

  test("exact n-gram jaccard: inverted-index pairs equal brute force, cap on/off") {
    import spark.implicits._
    val out = Dedup.jaccardNearDups(docs, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b", "inter", "uni").as[(Long, Long, Long, Long)].collect().toSet
    val sh = docs.select(col("doc_id").as("id"), Dedup.shingles(col("text")).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long"),
        size(array_union(col("a.sh"), col("b.sh"))).cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet
      .filter(t => t._3 * 5 >= t._4 * 4)
    assert(out == truth)
    assert(truth.nonEmpty)
    // a generous df-cap keeps every true pair (no gram in this corpus is hot
    // enough that ALL of a near-dup pair's shared grams get dropped)
    val capped = Dedup.jaccardNearDups(docs, "doc_id", "text", threshold = 0.8,
      maxDocFreq = 400L)
      .select("id_a", "id_b", "inter", "uni").as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == truth)
  }

  test("jaccard plan: only long-keyed exchanges, text never shuffles") {
    val plan = Dedup.jaccardNearDups(docs, "doc_id", "text", threshold = 0.8)
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(!l.contains("text#"), s"text column in a shuffle key:\n$l")
    }
  }

  test("simhash near-dups: EXACTLY the brute-force pair set at the configured radius") {
    import spark.implicits._
    val sigs = docs.select(col("doc_id").as("id"), Dedup.simhash(col("text")).as("sig"))
    for (maxDist <- Seq(3, 10)) {
      val out = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist)
        .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
      val brute = sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"), Dedup.hamming(col("a.sig"), col("b.sig")).as("d"))
        .filter(col("d") <= maxDist).as[(Long, Long, Long)].collect().toSet
      // bands = maxDist+1 ⇒ pigeonhole makes candidate recall 1.0, so the
      // verified output must EQUAL brute force — no silent misses at any radius
      assert(out == brute, s"maxDist=$maxDist: banding missed or invented pairs")
    }
  }

  test("simhash token hash matches the SQL-twin definition") {
    val h = extractous.spark.SimHashExpr.sqlTokenHash("abc")
    val h1 = (((0L * 31 + 'a') % 1000000007L * 31 + 'b') % 1000000007L * 31 + 'c') % 1000000007L
    val h2 = (((0L * 37 + 'a') % 1000000009L * 37 + 'b') % 1000000009L * 37 + 'c') % 1000000009L
    assert(h == h1 * 4294967296L + h2)
    assert(extractous.spark.SimHashExpr.sqlTokenHash("") == 0L)
    // codepoint iteration (DuckDB ascii(substr) yields codepoints per character)
    assert(extractous.spark.SimHashExpr.sqlTokenHash("的") == ((0L * 31 + 0x7684) % 1000000007L) * 4294967296L + (0L * 37 + 0x7684) % 1000000009L)
  }

  test("ivf knn: probing all cells reproduces brute force exactly") {
    import spark.implicits._
    val queries = embs.filter(col("vec_id") < 10)
    val brute = Similarity.bruteKnn(embs, queries, 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    val full = Similarity.ivfKnn(embs, queries, 5, nprobe = 10)
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    assert(full == brute)
  }

  test("ivf knn: nprobe=3 keeps reasonable recall while pruning 70% of cells") {
    import spark.implicits._
    val queries = embs.filter(col("vec_id") < 20)
    val brute = Similarity.bruteKnn(embs, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfKnn(embs, queries, 5, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.25, s"recall $recall collapsed — IVF probing broken")
  }

  test("hyperplane LSH near-dup recall on planted duplicates") {
    import spark.implicits._
    val e = embs.select(col("vec_id"), col("embedding"))
    val planted = e.union(e.select(col("vec_id") + 100000,
      transform(col("embedding"), x => x * lit(1.25f))))
    val found = Similarity.nearDupPairsLsh(planted, threshold = 0.99)
      .as[(Long, Long)].collect().toSet
    // scaled copies have cosine 1 and identical sign patterns → always same bucket
    val expected = embs.select("vec_id").as[Long].collect()
      .map(i => (i, i + 100000)).toSet
    assert(found == expected)
  }

  test("near-dup clustering: transitive closure with min-id representative") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs, ids).as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("near-dup clustering: long chain converges (label propagation fixpoint)") {
    import spark.implicits._
    val n = 12L
    val ids = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(pairs, ids).as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L), "whole chain must collapse to cluster 1")
  }

  test("large-star/small-star: deep path graph converges in O(log n) alternations") {
    import spark.implicits._
    // a 200-node path: min-label propagation needs ~199 rounds (would throw
    // at maxIters=25); the star alternation finishes inside 25
    val n = 200L
    val ids = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clustersLargeSmallStar(pairs, ids).as[(Long, Long)].collect()
    assert(out.length == 200 && out.forall(_._2 == 1L))
    intercept[IllegalStateException] { Dedup.clusters(pairs, ids, maxIters = 25) }
  }

  test("large-star/small-star ≡ min-label clusters on random graphs + singletons") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ids = (1L to 60L).toDF("id")
    val pairs = (1 to 50).map(_ => (1L + rnd.nextInt(60), 1L + rnd.nextInt(60)))
      .filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val a = Dedup.clusters(pairs, ids).as[(Long, Long)].collect().toMap
    val b = Dedup.clustersLargeSmallStar(pairs, ids).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("dropRepeatedLines: corpus-hot lines removed, unique lines survive in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique title one\nSHARED FOOTER\nbody line A"),
      (2L, "unique title two\nSHARED FOOTER\nbody line B"),
      (3L, "unique title three\nSHARED FOOTER\nbody line C"),
      (4L, "SHARED FOOTER"), // all-boilerplate doc: survives as text='' (one row per input doc)
      (5L, "kept once\nkept twice")).toDF("id", "text")
    val out = Dedup.dropRepeatedLines(docs, "id", "text", maxOccurrences = 2)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "unique title one\nbody line A")
    assert(out(2L) == "unique title two\nbody line B")
    assert(out(3L) == "unique title three\nbody line C")
    assert(out(4L) == "", "all-boilerplate doc keeps its row with empty text — downstream joins must see the id")
    assert(out(5L) == "kept once\nkept twice")
    // at the boundary: a line occurring exactly maxOccurrences times survives
    val pair = Seq((1L, "twice line"), (2L, "twice line")).toDF("id", "text")
    val kept = Dedup.dropRepeatedLines(pair, "id", "text", 2).as[(Long, String)].collect().toMap
    assert(kept(1L) == "twice line" && kept(2L) == "twice line")
  }

  test("scrubPii: emails/phones/ipv4 redacted, prose with hyphens and dots untouched") {
    import spark.implicits._
    val rows = Seq(
      "mail me at alice.b+spam@sub.example.co.uk today",
      "call (555) 123-4567 or 555-123-4567 now",
      "server at 192.168.0.1 responded",
      "well-known state-of-the-art v1.2.3 costs 12.50 in 2026",
      "no pii here at all").toDF("t")
    val out = rows.select(TextStats.scrubPii(col("t"))).as[String].collect()
    assert(out(0) == "mail me at [EMAIL] today")
    assert(out(1) == "call [PHONE] or [PHONE] now")
    assert(out(2) == "server at [IP] responded")
    assert(out(3) == "well-known state-of-the-art v1.2.3 costs 12.50 in 2026")
    assert(out(4) == "no pii here at all")
  }

  test("normalizeUrl: case, default ports, tracking params, fragments, trailing slash") {
    import spark.implicits._
    val cases = Seq(
      "https://Host.Example:443/Path/Sub/?utm_source=a&x=1&fbclid=z#frag" ->
        "https://host.example/Path/Sub?x=1",
      "http://example.com:80/" -> "http://example.com/",
      "https://example.com" -> "https://example.com/",
      "https://example.com/a?utm_campaign=only" -> "https://example.com/a",
      "not-a-url plain text" -> "not-a-url plain text", // schemeless: passthrough
      "https://example.com:8443/a" -> "https://example.com:8443/a") // non-default port kept
    val out = cases.map(_._1).toDF("u")
      .select(Dedup.normalizeUrl(col("u"))).as[String].collect()
    cases.map(_._2).zip(out).foreach { case (exp, got) => assert(got == exp, s"exp=$exp got=$got") }
  }

  test("dropRepeatedLines plan: count key is xxhash64, no full-text shuffle for counting") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"title $i\nSHARED\nbody $i")).toDF("id", "text")
    val df = Dedup.dropRepeatedLines(docs, "id", "text", 2)
    df.collect()
    val whole = df.queryExecution.executedPlan.toString
    // AQE's toString repeats the tree under "== Initial Plan ==" — audit the
    // final plan only
    val plan = whole.split("== Initial Plan ==")(0)
    assert(plan.contains("xxhash64"), s"hash shuffle key missing:\n$plan")
    // exchanges: count-aggregate on lh + reassembly on id (+ broadcast for
    // the anti-join, which is not a hash shuffle)
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(shuffles <= 2, s"line-dedup has $shuffles hash shuffles (expected ≤2):\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("SortMergeJoin"), s"anti-join missing:\n$plan")
  }

  test("substring dedup: cross-doc spans flagged with exact coverage, within-doc repeats ignored") {
    import spark.implicits._
    // k=3. Docs 1,2 share "one two three four" (two 3-grams at pos 0,1 →
    // coverage 4 tokens). Doc 3 repeats a 3-gram WITHIN itself only → clean.
    // Doc 4 shares nothing.
    val docs = Seq(
      (1L, "one two three four unique tail here"),
      (2L, "prefix bit one two three four"),
      (3L, "x y z pad pad x y z"),
      (4L, "completely different words again")
    ).toDF("doc_id", "text")
    val out = Dedup.substringFlags(docs, "text", "doc_id", k = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 4L, 1L),   // grams at pos 0,1 → union [0,4) = 4 tokens
      (2L, 2L, 4L, 1L),   // at pos 2,3
      (3L, 0L, 0L, 0L),   // within-doc repeat is not cross-doc
      (4L, 0L, 0L, 0L)))
  }

  test("substring dedup: non-contiguous spans sum coverage without double-counting overlaps") {
    import spark.implicits._
    // Shared spans at both ends of doc 1, separated by a unique middle
    val docs = Seq(
      (1L, "a b c UNIQ1 MID1 MID2 d e f"),
      (2L, "a b c other stuff"),
      (3L, "stuff other d e f")
    ).toDF("doc_id", "text")
    val out = Dedup.substringFlags(docs, "text", "doc_id", k = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: "a b c" at pos 0 and "d e f" at pos 6 → 2 grams, 6 covered tokens
    assert(out(0) == (1L, 2L, 6L))
  }

  test("substring cut: flagged spans removed from the normalized stream, overlaps merge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "AA one two three four tail words here"),  // shares "one two three four" region
      (2L, "prefix one two three four BB"),
      (3L, "nothing shared in this doc at all")
    ).toDF("doc_id", "text")
    val out = Dedup.cutFlaggedSpans(docs, "text", "doc_id", k = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // k=3 grams: docs 1,2 share "one two three" and "two three four" →
    // covered tokens 1..4 in doc1 (0-based), 1..4 in doc2; normalized = lowercase
    assert(out(1L) == "aa tail words here")
    assert(out(2L) == "prefix bb")
    assert(out(3L) == "nothing shared in this doc at all")
  }

  test("substring cut: non-contiguous spans cut independently; all-cut doc yields empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c MID d e f"),
      (2L, "a b c x"),
      (3L, "y d e f"),
      (4L, "a b c")   // whole doc is one shared gram → fully cut
    ).toDF("doc_id", "text")
    val out = Dedup.cutFlaggedSpans(docs, "text", "doc_id", k = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == "mid")
    assert(out(4L) == "")
  }

  test("substring dedup plan: corpus text never shuffles, every exchange is long-keyed") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"w$i x$i shared span body here now ok t$i")).toDF("doc_id", "text")
    val df = Dedup.substringFlags(docs, "text", "doc_id", k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the gram keys are hashes of tokens — no gram strings, and the
    // exchanges partition on id/gh longs, never on the text column
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { l =>
      assert(!l.contains("text#"), s"text column in a shuffle key:\n$l")
    }
    assert(plan.contains("ngram_keys"), s"imperative gram-key kernel missing:\n$plan")
  }

  test("normalizeUrl/scrubPii plans are narrow: zero exchanges") {
    import spark.implicits._
    val d = (1L to 20L).map(i => (i, s"https://EX.com:443/p$i/?utm_source=x&q=$i", s"text $i a@b.co"))
      .toDF("id", "url", "text")
    val df = d.select(Dedup.normalizeUrl(col("url")), TextStats.scrubPii(col("text")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow ops must not shuffle:\n$plan")
  }

  test("clusters: non-convergence raises instead of silently splitting components") {
    import spark.implicits._
    val ids = (1L to 8L).toDF("id")
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] { Dedup.clusters(pairs, ids, maxIters = 2) }
    assert(e.getMessage.contains("did not converge"))
  }

  test("d_corpus end-to-end plan: one small-column shuffle, cleaned text never moves") {
    val df = graft.SparkEntry.queries("d_corpus")(spark, sf)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    plan.linesIterator.filter(_.contains("Exchange")).foreach { l =>
      assert(!l.contains("clean#"), s"cleaned text in a shuffle:\n$l")
    }
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx <= 1, s"expected one hash shuffle (the dedup aggregate), got $hashEx:\n$plan")
  }

  test("fingerprint matches scala reference implementation") {
    import spark.implicits._
    val rows = docs.select(col("doc_id"), col("text"),
      TextStats.fingerprint(col("text")).as("fp")).as[(Long, String, Long)].collect()
    rows.take(50).foreach { case (id, text, fp) =>
      val ref = text.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % TextStats.FingerprintMod)
      assert(fp == ref, s"doc $id")
    }
  }

  test("char-n-gram langid recovers all 12 languages from held-out text, plan stays narrow") {
    import spark.implicits._
    import extractous.pipeline.LangData
    // evaluation stream keys differ from both the training stream (-1) and
    // the t_langid query's per-doc stream — triple-held-out
    val samples = (for (li <- LangData.langs.indices; seed <- 0 until 40) yield {
      val lang = LangData.langs(li)
      (lang, LangData.sampleText(lang, 900000L + seed * 12L + li, 60))
    }).toDF("lang", "content")
    val df = samples.withColumn("pred", extractous.pipeline.LangId.predict(col("content")))
    val wrong = df.filter(col("pred") =!= col("lang")).collect()
    assert(wrong.isEmpty, s"misclassified: ${wrong.take(5).mkString(", ")}")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"langid must be narrow:\n$plan")
  }

  test("BPE: every vocab word is one token, subword segmentation is exact on planted cases") {
    import extractous.pipeline.BpeModel
    // the closed-form t_tokens_bpe oracle rests on these three facts
    BpeModel.trainWords.foreach { w =>
      assert(BpeModel.tokenCount(w) == 1, s"'$w' → ${BpeModel.segment(w)}")
    }
    assert(BpeModel.segment("query7") == Vector("query", "7"))
    assert(BpeModel.tokenCount("0123456789") == 10) // digits unseen in training
    // segmentation is a partition: concatenating segments restores the word
    for (w <- Seq("querysort", "thequery", "xyzzy", "sparkly", "tablecustomer"))
      assert(BpeModel.segment(w).mkString == w, s"'$w' segments must concatenate back")
    // shared prefixes segment to learned subwords, never char soup
    assert(BpeModel.segment("querysort") == Vector("query", "sort"))
    assert(BpeModel.tokenCount("") == 0)
  }

  test("BPE training is deterministic and terminates with a full-vocab merges table") {
    import extractous.pipeline.BpeModel
    // re-deriving the table gives the identical sequence (pure function of
    // the vocabulary; lexicographic tie-breaks)
    assert(BpeModel.merges.nonEmpty && BpeModel.merges.size < 200)
    assert(BpeModel.merges.distinct.size == BpeModel.merges.size, "no merge learned twice")
    // counting composes over whitespace like the rest of the pipeline
    import org.apache.spark.unsafe.types.UTF8String
    assert(BpeModel.countTokens(UTF8String.fromString("the query  7seven\n sort")) ==
      1 + 1 + BpeModel.tokenCount("7seven") + 1)
  }

  test("langid on huge documents: bounded-prefix analysis still classifies correctly") {
    import org.apache.spark.unsafe.types.UTF8String
    import extractous.pipeline.LangData
    import extractous.spark.LangIdModel
    for (li <- Seq(0, 4, 8, 11)) { // de, it, ru, zh — three scripts
      val lang = LangData.langs(li)
      val big = LangData.sampleText(lang, 555L + li, 20000) // ~100+ KB
      assert(big.length > 39000) // zh words are single hanzi
      val u = UTF8String.fromString(big)
      LangIdModel.predict(u) // JIT warmup outside the timed window
      val ms = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        assert(LangIdModel.predict(u).toString == lang)
        (System.nanoTime() - t0) / 1e6
      }.min
      // O(1) bounded-prefix, not O(page): an unbounded scan of 100 KB took
      // seconds; generous bound because CI shares cores
      assert(ms < 500, s"bounded-prefix classify took $ms ms")
    }
  }

  test("langid packed fast path is per-row identical to the legacy string path") {
    import org.apache.spark.unsafe.types.UTF8String
    import extractous.pipeline.LangData
    import extractous.spark.LangIdModel
    // every language and script, held-out streams, mixed-language splices,
    // degenerate inputs, and a NUL-bearing text (forces the legacy path via
    // the packable guard — the two paths must still agree through predict)
    val cases = Seq.newBuilder[String]
    for (li <- LangData.langs.indices; seed <- Seq(7L, 991L))
      cases += LangData.sampleText(LangData.langs(li), seed * 31 + li, 60)
    cases += ""
    cases += "   "
    cases += "12345 !!! ???"
    cases += LangData.sampleText("en", 3L, 30) + " " + LangData.sampleText("ru", 4L, 30)
    cases += LangData.sampleText("zh", 5L, 10) + " " + LangData.sampleText("fr", 6L, 50)
    cases += "mix\u0000nul " + LangData.sampleText("sv", 8L, 40)
    cases.result().foreach { s =>
      val fast = LangIdModel.predict(UTF8String.fromString(s)).toString
      val legacy = LangIdModel.predictLegacy(
        { val u = UTF8String.fromString(s)
          (if (u.numChars() > LangIdModel.MaxChars) u.substringSQL(1, LangIdModel.MaxChars) else u).toString }).toString
      assert(fast == legacy, s"fast/legacy divergence on: ${s.take(60)}")
    }
  }

  test("langid is deterministic on degenerate input (empty / punctuation-only)") {
    import org.apache.spark.unsafe.types.UTF8String
    import extractous.spark.LangIdModel
    // no signal → all distances equal by symmetry is NOT guaranteed, but
    // the result must be stable across calls and a member of the lang set
    for (s <- Seq("", "   ", "12345 !!! ???")) {
      val a = LangIdModel.predict(UTF8String.fromString(s)).toString
      val b = LangIdModel.predict(UTF8String.fromString(s)).toString
      assert(a == b && extractous.pipeline.LangData.langs.contains(a))
    }
  }

  test("MJPEG-in-AVI roundtrip + frame sampling") {
    val payload = CorpusGen.videoPayload(7) // 2 frames
    assert(new String(payload, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(payload, 8, 4, "US-ASCII") == "AVI ")
    val frames = Multimodal.Avi.decode(payload)
    assert(frames.length == 2)
    // every movi chunk is a real baseline JPEG our codec decodes
    frames.foreach(f => assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8))
    import spark.implicits._
    val ds = spark.createDataset(Seq((7L, payload)))
    val out = Multimodal.frameSample(ds, 2).collect().head
    assert(out.n_frames == 2 && out.sampled_frames == Seq(0) && out.first_frame_text == "F0 7")
  }

  test("AVI walker: odd-length frames word-align, truncation fails cleanly") {
    val f1 = Array.tabulate[Byte](33)(i => i.toByte) // odd length → pad byte
    val f2 = Array.tabulate[Byte](8)(i => (100 + i).toByte)
    val avi = Multimodal.Avi.encode(Seq(f1, f2), 16, 16)
    val back = Multimodal.Avi.decode(avi)
    assert(back.length == 2)
    assert(back(0).sameElements(f1) && back(1).sameElements(f2))
    intercept[Exception] { Multimodal.Avi.decode(avi.take(avi.length - 6)) }
  }

  test("audio WAV header roundtrip") {
    val payload = CorpusGen.audioPayload(13)
    val m = Multimodal.Wav.decode(payload)
    assert(m.sample_rate == 8000 + (13 % 4) * 4000)
    assert(m.channels == 1 + 13 % 2)
    assert(m.n_samples == 100 + 13 % 50)
  }

  test("corrupt container sizes error instead of fabricating results") {
    // negative RIFF size dword: must error, not decode as "0 frames"
    val avi = Multimodal.Avi.encode(Seq(Array.tabulate[Byte](8)(_.toByte)), 16, 16)
    val negSize = avi.clone()
    negSize(4) = 0; negSize(5) = 0; negSize(6) = 0; negSize(7) = 0x80.toByte
    intercept[Exception] { Multimodal.Avi.decode(negSize) }
    // WAV whose data chunk declares more bytes than the file carries: error,
    // not a fabricated n_samples/duration
    val wav = CorpusGen.audioPayload(13)
    intercept[Exception] { Multimodal.Wav.decode(wav.take(60)) }
    // resize factor must be validated on the driver, not blow up in a task
    import spark.implicits._
    val ds = spark.createDataset(Seq((1L, CorpusGen.payload(90, "words", "en"))))
    intercept[IllegalArgumentException] { Multimodal.resize(ds, 0) }
  }

  test("resize halves dimensions and preserves decodability") {
    import spark.implicits._
    val img = CorpusGen.payload(90, "some sample words", "en") // image kind
    val ds = spark.createDataset(Seq((90L, img)))
    val out = Multimodal.resize(ds, 2).collect().head
    val g = extractous.ocr.Bmp.decode(out.bytes)
    assert(g.width == out.width && g.height == out.height)
    val orig = extractous.ocr.Bmp.decode(img)
    assert(out.width == orig.width / 2 && out.height == orig.height / 2)
  }
}
