package extractous.spark

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** string → total BPE subword token count (model: [[extractous.pipeline.BpeModel]]);
  * narrow per-row, codegen'd via static call.
  */
final case class BpeCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"
  override protected def nullSafeEval(input: Any): Any =
    extractous.pipeline.BpeModel.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"extractous.pipeline.BpeModel.countTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}
