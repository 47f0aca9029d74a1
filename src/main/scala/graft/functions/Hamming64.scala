package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** `hamming64(a, b)` — popcount(a XOR b) over two int64 columns: the
  * perceptual-hash distance primitive (phash near-duplicate detection).
  * Spark has no builtin; a native Catalyst expression with codegen
  * keeps it inside WholeStageCodegen instead of a boxed Scala UDF
  * (SURVEY.md §2.11 preference order: Expression > UDF).
  *
  * Reference analog: the per-row payload-similarity checks
  * (maintenance/export-dataset.py:205-217 size audit generalized to
  * perceptual distance).
  */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming64 needs (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)
}

object Hamming64 {
  /** Column API. */
  def hamming64(a: Column, b: Column): Column =
    GraftColumnBridge.toCol(
      Hamming64(GraftColumnBridge.toExpr(a), GraftColumnBridge.toExpr(b)))

  /** SQL registration: `SELECT hamming64(x, y)` — int args coerced. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming64",
      exprs => Hamming64(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head, LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), LongType)),
      "built-in")
}
