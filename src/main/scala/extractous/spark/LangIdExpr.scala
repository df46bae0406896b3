package extractous.spark

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cavnar–Trenkle character-n-gram language model, trained at class load
  * from the embedded lexicons ([[extractous.pipeline.LangData]]) — a few KB
  * of deterministic constants per executor, the same
  * ship-the-model-with-the-plan pattern as the IVF centroid table. No
  * external model files, no egress.
  */
object LangIdModel {
  /** profile depth (top-K grams per language / per document) */
  final val K = 300
  /** out-of-place cost for a gram absent from the language profile */
  final val Absent = K

  // hoisted: replaceAll would re-compile this Pattern on every row
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Gram extraction: words padded with '_' (the classic C&T boundary
    * marker), all 1/2/3-grams by codepoint. Deterministic gram ordering for
    * rank ties: (count desc, gram asc).
    */
  def grams(text: String): java.util.HashMap[String, Int] = {
    val counts = new java.util.HashMap[String, Int]()
    val padded = "_" + Ws.matcher(text.trim).replaceAll("_") + "_"
    var n = 1
    while (n <= 3) {
      var i = 0
      // iterate by Char (BMP-safe for our scripts; CJK sits in the BMP)
      while (i + n <= padded.length) {
        val g = padded.substring(i, i + n)
        counts.merge(g, 1, (a, b) => a + b)
        i += 1
      }
      n += 1
    }
    counts
  }

  def topRanks(counts: java.util.HashMap[String, Int], k: Int): Array[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    counts.asScala.toArray
      .sortBy { case (g, c) => (-c, g) }
      .take(k)
      .zipWithIndex
      .map { case ((g, _), r) => (g, r) }
  }

  /** lang → (gram → rank) maps, trained from 4000 sampled words each. */
  val profiles: Array[(String, java.util.HashMap[String, Integer])] =
    extractous.pipeline.LangData.langs.map { lang =>
      val text = extractous.pipeline.LangData.sampleText(lang, streamSeed = -1L, n = 4000)
      val m = new java.util.HashMap[String, Integer]()
      topRanks(grams(text), K).foreach { case (g, r) => m.put(g, r) }
      (lang, m)
    }.toArray

  private val langNames: Array[UTF8String] =
    profiles.map { case (l, _) => UTF8String.fromString(l) }

  /** Gram statistics saturate within a few hundred bytes (Cavnar & Trenkle
    * report reliable ID at 300 B); capping the analyzed prefix bounds the
    * per-row cost on real 20–100 KB pages to O(1) instead of O(page) with
    * a sort — the same defensive bound the truncating TextEmitter applies
    * to extraction. 4 KB is ~13× the saturation point.
    */
  final val MaxChars = 4096

  /** Static entry point referenced by generated code. */
  def predict(s: UTF8String): UTF8String = {
    val capped = if (s.numChars() > MaxChars) s.substringSQL(1, MaxChars) else s
    val doc = topRanks(grams(capped.toString), K)
    var bestIdx = 0
    var bestDist = Long.MaxValue
    var li = 0
    while (li < profiles.length) {
      val prof = profiles(li)._2
      var d = 0L
      var gi = 0
      while (gi < doc.length) {
        val (g, r) = doc(gi)
        val pr = prof.get(g)
        d += (if (pr == null) Absent else math.abs(r - pr.intValue()))
        gi += 1
      }
      // strict < keeps the first (lexicographically smallest) lang on ties
      if (d < bestDist) { bestDist = d; bestIdx = li }
      li += 1
    }
    langNames(bestIdx)
  }
}

/** string → predicted language code; narrow, codegen'd via static call. */
final case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "langid_ngram"
  override protected def nullSafeEval(input: Any): Any =
    LangIdModel.predict(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"extractous.spark.LangIdModel.predict($c)")
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
