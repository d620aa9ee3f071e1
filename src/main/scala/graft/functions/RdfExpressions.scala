package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.{GraftShim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hot per-row term-sanitization
 * functions — codegen'd (a static Java call inside whole-stage codegen)
 * instead of Scala UDFs, so rule application stays in the
 * WholeStageCodegen span. See SURVEY.md §2 op 9 and §4 ("Needs custom
 * Catalyst artifacts?").
 */
case class SafeIriExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(RdfStrings.safeIri(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.RdfStrings.safeIri($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): SafeIriExpr =
    copy(child = newChild)
  override def prettyName: String = "safe_iri"
}

case class CleanBlankNodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(RdfStrings.cleanBlankNode(v.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.RdfStrings.cleanBlankNode($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): CleanBlankNodeExpr =
    copy(child = newChild)
  override def prettyName: String = "clean_blank_node"
}

/** True iff the string is a valid final IRI per the reference's charset
  * check (utils.cpp:184-201). */
case class IriIsValidExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullSafeEval(v: Any): Any =
    RdfStrings.iriIsValid(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RdfStrings.iriIsValid($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): IriIsValidExpr =
    copy(child = newChild)
  override def prettyName: String = "iri_is_valid"
}

/** Column-level API over the native expressions. */
object RdfFunctions {
  def safe_iri(c: Column): Column =
    ExpressionUtils.column(SafeIriExpr(ExpressionUtils.expression(c)))
  def clean_blank_node(c: Column): Column =
    ExpressionUtils.column(CleanBlankNodeExpr(ExpressionUtils.expression(c)))
  def iri_is_valid(c: Column): Column =
    ExpressionUtils.column(IriIsValidExpr(ExpressionUtils.expression(c)))
}
