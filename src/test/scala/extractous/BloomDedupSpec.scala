package extractous

import extractous.pipeline.BloomDedup
import extractous.spark.BloomKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-gated incremental dedup: kernel vs a plain-Scala reference
  * (kernel-twin rule), the no-false-negative guarantee under a deliberately
  * saturated filter, exact-membership agreement at the default size, and
  * the narrow zero-exchange probe plan.
  */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Mod = 1000000007L
  // independent reference formulation
  private def refPoly(s: String): Long =
    s.codePoints.toArray.foldLeft(0L)((a, c) => (a * 31 + c) % Mod)
  private def refPositions(fp: Long, m: Int): Seq[Long] =
    Seq((31L, 7L), (131L, 77L), (1009L, 777L), (9176L, 7777L))
      .map { case (a, b) => ((fp * a + b) % Mod) % m }

  test("property: kernel positions and membership equal the reference on 500 keys") {
    val m = 4096
    val rnd = new scala.util.Random(1311)
    val keys = Seq.fill(500)(math.abs(rnd.nextLong()) % Mod)
    val seen = keys.take(250)
    val refSet = seen.flatMap(refPositions(_, m)).toSet
    val bits = new Array[Long]((m + 63) / 64)
    refSet.foreach(p => bits((p >>> 6).toInt) |= 1L << (p & 63))
    keys.foreach { fp =>
      assert(BloomKernel.positions(fp, m).toLongArray().toSeq == refPositions(fp, m))
      val expect = refPositions(fp, m).forall(refSet.contains)
      assert(BloomKernel.maybeContains(fp, bits, m) == expect, s"fp=$fp")
    }
    // every inserted key MUST test positive (no false negatives)
    seen.foreach(fp => assert(BloomKernel.maybeContains(fp, bits, m)))
  }

  test("end-to-end: kept rows are exactly the genuinely-new keys at the default size") {
    import spark.implicits._
    val texts = (0 until 120).map(i => (i.toLong, if (i % 4 == 0) s"shared text ${i % 8}" else s"unique text $i"))
    val df = texts.toDF("doc_id", "text")
      .select(col("doc_id"), extractous.spark.signatures.poly_fingerprint(col("text")).as("fp"))
    val seen = df.filter(col("doc_id") % 2 === 0)
    val probe = df.filter(col("doc_id") % 2 === 1)
    val bits = BloomDedup.build(seen, col("fp"))
    val flagged = BloomDedup.flagged(probe, "doc_id", col("fp"), bits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // exact membership reference
    val seenFps = texts.filter(_._1 % 2 == 0).map(t => refPoly(t._2)).toSet
    texts.filter(_._1 % 2 == 1).foreach { case (id, t) =>
      val expect = if (seenFps.contains(refPoly(t))) 1L else 0L
      // at 16 KB / 4 hashes / ~60 keys a false positive would need P≈1e-13:
      // disagreement here means a real defect, not bloom noise
      assert(flagged(id) == expect, s"doc $id")
    }
    val fresh = BloomDedup.fresh(probe, col("fp"), bits).count()
    assert(fresh == flagged.count(_._2 == 0L))
  }

  test("saturated filter keeps the one-sided guarantee: no seen key ever passes fresh()") {
    import spark.implicits._
    val m = 64 // absurdly small on purpose: force false positives
    val df = (0 until 200).map(i => (i.toLong, s"doc number $i")).toDF("doc_id", "text")
      .select(col("doc_id"), extractous.spark.signatures.poly_fingerprint(col("text")).as("fp"))
    val f = BloomDedup.build(df, col("fp"), m)
    // probing the seen side itself: everything must flag maybe_seen=1
    val leaked = BloomDedup.fresh(df, col("fp"), f).count()
    assert(leaked == 0L, "a false negative is impossible by construction")
  }

  test("out-of-contract 64-bit fingerprints (negative / huge) fold deterministically, never crash") {
    import spark.implicits._
    // xxhash64-style keys: half negative, magnitudes far above the poly mod —
    // build and probe with the SAME values must still show zero false negatives
    val keys = Seq(Long.MinValue, -987654321987L, -1L, 0L, 1L, 987654321987L, Long.MaxValue)
    val df = keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("doc_id", "fp")
    val f = BloomDedup.build(df, col("fp"), m = 2048)
    assert(BloomDedup.fresh(df, col("fp"), f).count() == 0L,
      "no false negatives even for out-of-contract inputs")
    // in-contract values are untouched by the normalization (floorMod no-op)
    assert(extractous.spark.BloomKernel.position(12345L, 0, 2048) ==
      ((12345L * 31 + 7) % 1000000007L) % 2048)
  }

  test("sharded: routing isolates shards — a position set in another shard is never a hit") {
    import spark.implicits._
    // two keys with fp ≡ 0 and ≡ 1 (mod 2): same positions in DIFFERENT
    // shards must not alias. Craft fps directly (the fp column is the key).
    val seenDf = Seq((0L, 10L)).toDF("doc_id", "fp") // shard 0
    val f = BloomDedup.buildSharded(seenDf, col("fp"), shards = 2, m = 64)
    // fp=10 is seen (shard 0). A probe fp=11 (shard 1) — even if its four
    // positions all collide with fp=10's in the 64-bit space, shard 1's
    // bits are empty, so it MUST test fresh.
    val probe = Seq((1L, 10L), (2L, 11L)).toDF("doc_id", "fp")
    val got = BloomDedup.flaggedSharded(probe, "doc_id", col("fp"), f)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == 1L, "the seen key must flag in its own shard")
    // shard-1 filter is all zeros: anything routed there is guaranteed new
    assert(got(2L) == 0L, "an empty shard can never produce a hit")
  }

  test("sharded: no false negatives, and shards=1 equals the unsharded filter bit-for-bit") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, s"document body $i")).toDF("doc_id", "text")
      .select(col("doc_id"), extractous.spark.signatures.poly_fingerprint(col("text")).as("fp"))
    val seen = df.filter(col("doc_id") % 3 =!= 0)
    val probe = df.filter(col("doc_id") % 3 === 0)
    val sharded = BloomDedup.buildSharded(seen, col("fp"), shards = 4, m = 8192)
    // one-sided guarantee holds per shard
    assert(BloomDedup.freshSharded(seen, col("fp"), sharded).count() == 0L)
    // shards=1 degenerates to exactly the single filter
    val one = BloomDedup.buildSharded(seen, col("fp"), shards = 1, m = 8192)
    val flat = BloomDedup.build(seen, col("fp"), m = 8192)
    assert(java.util.Arrays.equals(one.bits, flat.bits))
    val a = BloomDedup.flaggedSharded(probe, "doc_id", col("fp"), one)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = BloomDedup.flagged(probe, "doc_id", col("fp"), flat)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("sharded plan: the probe is still a narrow zero-exchange projection") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, i.toLong * 31 + 5)).toDF("doc_id", "fp")
    val plan = BloomDedup.flaggedSharded(df, "doc_id", col("fp"),
        BloomDedup.ShardedFilter(new Array[Long](4 * 512), 32768, 4))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"sharded bloom probe must be narrow:\n$plan")
  }

  test("plan: the probe is a narrow zero-exchange projection") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, i.toLong * 31 + 5)).toDF("doc_id", "fp")
    val plan = BloomDedup.flagged(df, "doc_id", col("fp"),
        BloomDedup.Filter(new Array[Long](2048), 131072))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"bloom probe must be narrow:\n$plan")
  }
}
