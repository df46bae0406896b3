package extractous.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.xbridge.ColumnBridge

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

/** array<string> shingles → array<bigint> minhash signature. */
final case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  import SignatureHash._
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"
  @transient private lazy val (ca, cb) = coeffs(numHashes)

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
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
final case class SimHashExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash64"

  override def eval(input: InternalRow): Any = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    if (arr != null) {
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = SimHashExpr.sqlTokenHash(arr.getUTF8String(i).toString)
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
    java.lang.Long.valueOf(fp)
  }
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr = copy(child = newChild)
}

object SimHashExpr {
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

object signatures {
  def minhash_sig(shingles: Column, numHashes: Int = 64): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(shingles), numHashes))
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(tokens)))
}
