package extractous.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.xbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Imperative signature expressions for the dedup family.
  *
  * The composed higher-order-function formulation (`transform`/`array_min` per
  * permutation) is interpreted per element and allocates one intermediate
  * array per permutation per row — measured ~10s for 5k docs. These
  * expressions do one tight pass per row with zero intermediate allocation
  * (SURVEY.md §2.2: custom Catalyst `Expression` beats HOF composition beats
  * UDF). Same hash family (splitmix64-derived coefficients, 32-bit hash space
  * mod a >2^32 prime), so LSH behavior is unchanged.
  */
object SignatureHash {
  final val Prime = 4294967311L // smallest prime > 2^32

  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic 64-bit hash of a UTF8 byte slice (FNV-1a + finalizer). */
  @inline def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    mix(h)
  }

  def coeffs(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      a(j) = (mix(j.toLong * 2 + 1) & 0x7fffffffL) | 1L
      b(j) = mix(j.toLong * 2 + 2) & 0x7fffffffL
      j += 1
    }
    (a, b)
  }
}

/** array<string> shingles → array<bigint> minhash signature. Static-call
  * codegen (no CodegenFallback): the containing projection stays in
  * whole-stage codegen and CSE applies. Coefficient arrays are cached per
  * numHashes (executor-wide, deterministic).
  */
object MinHashSig {
  import SignatureHash._
  private val coeffCache = new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()

  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val (ca, cb) = coeffCache.computeIfAbsent(numHashes, n => coeffs(n))
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (arr != null) {
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = hashBytes(arr.getUTF8String(i).getBytes) & 0xffffffffL
        var j = 0
        while (j < numHashes) {
          val v = (h * ca(j) + cb(j)) % Prime
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

final case class MinHashSigExpr(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"extractous.spark.MinHashSig.compute($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr = copy(child = newChild)
}

/** array<string> tokens → 64-bit simhash fingerprint.
  *
  * Token hash = two independent polynomial rolling hashes over codepoints
  * (h1 = fold(a·31 + cp) mod 1e9+7, h2 = fold(a·37 + cp) mod 1e9+9) packed as
  * h1·2³² + h2 — deliberately expressible in ANSI SQL (`ascii`/`substr`/
  * `list_reduce`), so the ENTIRE simhash pipeline mirrors into the DuckDB
  * oracle (the earlier FNV-mix hash was opaque to SQL and left d_simhash
  * unverifiable). 62 effective bits (h1 < 2³⁰); bits 62-63 vote all-negative
  * and stay 0 on both engines.
  */
final case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"extractous.spark.SimHashExpr.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr = copy(child = newChild)
}

object SimHashExpr {
  /** Static entry point referenced by generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    if (arr != null) {
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = sqlTokenHash(arr.getUTF8String(i).toString)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) != 0L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
        i += 1
      }
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) fp |= (1L << bit)
      bit += 1
    }
    fp
  }

  /** SQL-twin token hash: iterate CODEPOINTS (what SQL `ascii(substr(t,i,1))`
    * yields per character), two polynomial folds, pack into one long.
    */
  def sqlTokenHash(s: String): Long = {
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h1 = (h1 * 31 + cp) % 1000000007L
      h2 = (h2 * 37 + cp) % 1000000009L
      i += Character.charCount(cp)
    }
    h1 * 4294967296L + h2
  }
}

/** One-pass polynomial fingerprint: h = fold(h·31 + codepoint) mod 1e9+7.
  *
  * Semantics are IDENTICAL to the SQL formulation
  * `aggregate(transform(sequence(1, length(c)), i -> ascii(substr(c, i, 1))), ...)`
  * that the DuckDB oracles for `t_fingerprint` / `d_split` replay — both fold
  * the same polynomial over Unicode CODEPOINTS — but the HOF formulation is
  * O(n²) per row: every `substr(i, 1)` scans the UTF8String from the start to
  * find codepoint i, plus an n-element int array per row. On the oracle's
  * ~0.3 KB seeds that is invisible; on real 20–100 KB pages it is the per-row
  * scale-killer for the content-keyed train/val/test splitter
  * (`Sampling.split`). This expression decodes the UTF-8 bytes once —
  * O(n), zero allocation — and codegens to a static call so the projection
  * stays inside whole-stage codegen.
  */
object FingerprintHash {
  final val Mod = 1000000007L

  /** Static entry point referenced by generated code. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xe0) == 0xc0) { cp = b0 & 0x1f; len = 2 }
      else if ((b0 & 0xf0) == 0xe0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var k = 1
      while (k < len && i + k < bytes.length) {
        cp = (cp << 6) | (bytes(i + k) & 0x3f)
        k += 1
      }
      h = (h * 31 + cp) % Mod
      i += len
    }
    h
  }
}

final case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    FingerprintHash.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"extractous.spark.FingerprintHash.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

/** One-pass top-2-gram repetition scan (Gopher §A1.1 "fraction of 2-grams in
  * the most common 2-gram").
  *
  * Tokenize on `\s+` (exact `String.split` semantics — what Spark's `split`
  * and the oracle's `regexp_split_to_array` produce), hash each token to 64
  * bits, combine adjacent pairs into one order-sensitive gram hash, sort the
  * long[] and run-length-scan for the longest run. Replaces the HOF
  * formulation (gram-string materialization + `array_sort` + struct-valued
  * `aggregate` allocating a row per step) whose constant was ~20× the
  * neighboring quality signals — same precedent as [[MinHashSigExpr]]. Gram
  * equality is by 64-bit hash: two DISTINCT grams colliding within one
  * document (≈ g²/2⁶⁵, vanishing at any real document size) is the accepted
  * trade the VERDICT endorses; equal grams always collide, so the top count
  * can only theoretically merge runs, never split them.
  *
  * Returns struct(n_2grams, top2_count, top2_frac_x1000) — the frac is
  * computed inside the expression with the same double arithmetic as the
  * oracle's `floor(1000.0 * topc / greatest(n2, 1))`, so one pass yields all
  * three columns.
  */
object Top2GramHash {
  // hoisted: String.split("\s+") re-compiles the Pattern on every call —
  // a per-row cost on exactly the hot kernel this object exists to speed up
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String): InternalRow = {
    val toks0 = Ws.split(s.toString, -1)
    var nTok = 0
    var t = 0
    while (t < toks0.length) { if (toks0(t).nonEmpty) nTok += 1; t += 1 }
    if (nTok < 2) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val hs = new Array[Long](nTok)
    var j = 0
    t = 0
    while (t < toks0.length) {
      if (toks0(t).nonEmpty) {
        hs(j) = SignatureHash.hashBytes(toks0(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        j += 1
      }
      t += 1
    }
    val g = nTok - 1
    val grams = new Array[Long](g)
    var i = 0
    while (i < g) {
      grams(i) = SignatureHash.mix(hs(i) * 0x100000001b3L + hs(i + 1))
      i += 1
    }
    java.util.Arrays.sort(grams)
    var best = 1
    var run = 1
    i = 1
    while (i < g) {
      if (grams(i) == grams(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    val frac = math.floor(1000.0 * best / g).toLong
    new GenericInternalRow(Array[Any](g.toLong, best.toLong, frac))
  }
}

final case class Top2GramExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_2grams", LongType, nullable = false),
    StructField("top2_count", LongType, nullable = false),
    StructField("top2_frac_x1000", LongType, nullable = false)))
  override def prettyName: String = "top2gram"
  override protected def nullSafeEval(input: Any): Any =
    Top2GramHash.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"extractous.spark.Top2GramHash.compute($c)")
  override protected def withNewChildInternal(newChild: Expression): Top2GramExpr =
    copy(child = newChild)
}

/** Positional word-n-gram keys over normalized tokens — the shared kernel of
  * decontamination and substring dedup. Bit-identical to the HOF
  * formulation it replaced (`transform(normTokens, xxhash64)` +
  * `aggregate(slice(...))` rotate-XOR combine — kept as the spec-side
  * reference in `Decontam.ngramKeysHof`): same Spark `lower`
  * (UTF8String.toLowerCase), same `[^a-z0-9一-鿿]+` split, same
  * seed-42 xxhash64 per token, same rot21-XOR combine. One pass, one token
  * hash each, no per-gram slice allocation — the HOF version cost ~38 µs
  * PER GRAM (interpreted lambda per element), which made the substring
  * dedup's gram stage the slowest headline query.
  */
object NgramKeys {
  private val SplitRe = java.util.regex.Pattern.compile("[^a-z0-9\\u4e00-\\u9fff]+")
  final val Seed = 1125899906842597L

  @inline private def rot21(x: Long): Long = (x << 21) | (x >>> 43)

  /** The pipeline's shared normalization: Spark `lower` + split on
    * non-alphanumerics, empties dropped. Gram positions, decontamination
    * keys, and span cutting must all index the SAME token stream.
    */
  def normTokens(s: UTF8String): Array[String] = {
    val toks0 = SplitRe.split(s.toLowerCase.toString, -1)
    var nTok = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nTok += 1; i += 1 }
    val out = new Array[String](nTok)
    var j = 0
    i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { out(j) = toks0(i); j += 1 }
      i += 1
    }
    out
  }

  def compute(s: UTF8String, n: Int): Array[Long] = {
    val toks = normTokens(s)
    val nTok = toks.length
    if (nTok < n) return Array.emptyLongArray
    val hs = new Array[Long](nTok)
    var j = 0
    while (j < nTok) {
      hs(j) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        UTF8String.fromString(toks(j)), org.apache.spark.sql.types.StringType, 42L)
      j += 1
    }
    val out = new Array[Long](nTok - n + 1)
    var i = 0
    while (i <= nTok - n) {
      var acc = Seed
      var k = 0
      while (k < n) { acc = rot21(acc) ^ hs(i + k); k += 1 }
      out(i) = acc
      i += 1
    }
    out
  }
}

final case class NgramKeysExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ngram_keys"
  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      NgramKeys.compute(input.asInstanceOf[UTF8String], n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(extractous.spark.NgramKeys.compute($c, $n))")
  override protected def withNewChildInternal(newChild: Expression): NgramKeysExpr =
    copy(child = newChild)
}

/** Distinct word n-gram shingle STRINGS in one pass — input to the MinHash
  * signature and the exact-Jaccard verify. Produces exactly the arrays of
  * the HOF formulation (`array_distinct(transform(sequence, concat_ws(" ",
  * slice(split(trim(text))))))` — kept as `Dedup.shinglesHof`, property-
  * tested): UTF8String.trim is Spark's space-only `trim`, `String.split`
  * is Spark's `split`, first-occurrence order preserved, and the
  * fewer-than-n-tokens fallback is the whole text as ONE shingle. The HOF
  * version cost ~2.8 s per evaluation at sf0.1 and the near-dup plan
  * evaluates shingles three times (signature + both verify sides).
  */
object ShingleKernel {
  // hoisted Pattern: shingles are evaluated three times per doc in the
  // near-dup plan — per-call regex compilation is pure overhead
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def compute(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = Ws.split(s.trim.toString, -1)
    if (toks.length < n)
      return new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

final case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shingles"
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"extractous.spark.ShingleKernel.compute($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** Remove flagged ≥k-token spans from the NORMALIZED token stream — the
  * actual dedup cut of Lee et al. 2022 (the flags variant only reports).
  * Inputs: the document text and the SORTED array of flagged gram start
  * positions (indices into [[NgramKeys.normTokens]], the same token stream
  * the gram keys were computed over). A token at index i is cut iff some
  * flagged position p ≤ i has p + k > i — a two-pointer walk, O(tokens +
  * positions) per row, no per-token membership scans. Output is the
  * surviving tokens joined with single spaces (span removal is defined on
  * the normalized stream, as in minhash-dedup pipelines — original
  * whitespace/punctuation of removed regions is not reconstructible).
  */
object CutSpans {
  def compute(s: UTF8String, ps: ArrayData, k: Int): UTF8String = {
    val toks = NgramKeys.normTokens(s)
    val m = ps.numElements()
    val sb = new java.lang.StringBuilder
    var coverEnd = -1
    var j = 0
    var i = 0
    var first = true
    while (i < toks.length) {
      while (j < m && ps.getInt(j) <= i) {
        val e = ps.getInt(j) + k
        if (e > coverEnd) coverEnd = e
        j += 1
      }
      if (i >= coverEnd) {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

final case class CutSpansExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "cut_spans"
  override protected def nullSafeEval(text: Any, ps: Any): Any =
    CutSpans.compute(text.asInstanceOf[UTF8String], ps.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"extractous.spark.CutSpans.compute($t, $p, $k)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CutSpansExpr =
    copy(left = newLeft, right = newRight)
}

/** Covered-token count of the union of length-k spans starting at the SORTED
  * positions `ps` — the reporting step of substring dedup. Replicates exactly
  * the HOF `when(size(ps)===1, k).otherwise(aggregate(sequence(1, size-1), k,
  * (acc, i) => acc + least(k, ps[i+1] - ps[i])))`: cov = k + Σ min(k, gap),
  * pure int arithmetic so equality is trivial; the HOF was interpreted per
  * flagged gram. size(ps)==0 is unreachable from the wired plans (the
  * aggregate only emits groups with ≥1 position) and returns 0.
  */
final case class SpanCoverageExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "span_coverage"
  override protected def nullSafeEval(input: Any): Any =
    SpanCoverage.compute(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"extractous.spark.SpanCoverage.compute($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): SpanCoverageExpr =
    copy(child = newChild)
}

object SpanCoverage {
  def compute(ps: ArrayData, k: Int): Int = {
    val n = ps.numElements()
    if (n == 0) return 0
    var acc = k
    var j = 1
    while (j < n) {
      val d = ps.getInt(j) - ps.getInt(j - 1)
      acc += (if (d < k) d else k)
      j += 1
    }
    acc
  }
}

object signatures {
  def minhash_sig(shingles: Column, numHashes: Int = 64): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), numHashes))
  def span_coverage(ps: Column, k: Int): Column =
    ColumnBridge.column(SpanCoverageExpr(ColumnBridge.expression(ps), k))
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(tokens)))
  def poly_fingerprint(c: Column): Column =
    ColumnBridge.column(FingerprintExpr(ColumnBridge.expression(c)))
  def top2gram(c: Column): Column =
    ColumnBridge.column(Top2GramExpr(ColumnBridge.expression(c)))
  def langid(c: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(c)))
  def lang_sample_text(id: Column, n: Int): Column =
    ColumnBridge.column(LangSampleExpr(ColumnBridge.expression(id), n))
  def bpe_count(c: Column): Column =
    ColumnBridge.column(BpeCountExpr(ColumnBridge.expression(c)))
  def ngram_keys(c: Column, n: Int): Column =
    ColumnBridge.column(NgramKeysExpr(ColumnBridge.expression(c), n))
  def cut_spans(text: Column, ps: Column, k: Int): Column =
    ColumnBridge.column(CutSpansExpr(ColumnBridge.expression(text), ColumnBridge.expression(ps), k))
  def shingles(c: Column, n: Int): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(c), n))
  def gopher_report(c: Column, minWords: Int): Column =
    ColumnBridge.column(GopherExpr(ColumnBridge.expression(c), minWords))

  def c4_clean(c: Column): Column =
    ColumnBridge.column(C4CleanExpr(ColumnBridge.expression(c)))
}
