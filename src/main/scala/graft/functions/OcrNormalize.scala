package graft.functions

import graft.extract.Normalizer
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** `ocr_normalize(text)` as a native Catalyst expression with real
  * codegen (SURVEY.md §2 X9 / U1 exposed to SQL users): whole-stage
  * codegen emits a direct static call to the normalizer kernel — the
  * same pattern Spark's own string built-ins use (a call into a
  * UTF8String/static helper), so the expression never breaks a codegen
  * span the way a ScalaUDF does.
  */
case class OcrNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "ocr_normalize"

  override protected def nullSafeEval(input: Any): Any =
    OcrNormalize.eval(input.asInstanceOf[UTF8String])

  // NB: must reference the module explicitly — `OcrNormalize.eval(...)`
  // in generated Java resolves against the case CLASS, whose companion
  // gets no static `eval` forwarder (it clashes with Expression.eval),
  // so Janino fails and Spark silently falls back to interpreted eval.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.OcrNormalize$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): OcrNormalize =
    copy(child = newChild)
}

object OcrNormalize {
  /** Static entry point shared by interpreted eval and generated code. */
  def eval(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalizer.normalize(s.toString))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[OcrNormalize].getCanonicalName, "ocr_normalize")

  private val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "ocr_normalize takes exactly 1 argument")
    OcrNormalize(exprs.head)
  }

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ocr_normalize", builder, "built-in")
}

/** SparkSessionExtensions hook (spark.sql.extensions=graft.functions.
  * GraftExtensions, or SparkSession.builder().withExtensions(new
  * GraftExtensions)) — registers the engine's SQL-visible functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("ocr_normalize"),
      OcrNormalize.info,
      exprs => OcrNormalize(exprs.head)))
  }
}
