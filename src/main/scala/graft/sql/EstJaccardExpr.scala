package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Signature-estimated Jaccard: the fraction of equal components between
  * two MinHash signatures (array<long>), the standard estimator
  * E[equal/H] = J (Broder '97).
  *
  * Native instead of a UDF because this is the hottest scalar in pair
  * verification: it gates EVERY candidate pair, and a `Seq[Long]` UDF boxes
  * 2 x H longs per pair through the Catalyst-to-Scala converter — at
  * millions of candidates that allocation was a measured slice of the edge
  * stage's GC wall. Here both interpreted eval and generated code loop over
  * the unsafe array words directly (ArrayData.getLong), zero boxing, and
  * the expression stays inside whole-stage codegen.
  *
  * Semantics match the column form it replaces (zip_with pads a length
  * mismatch with null = unequal; divide by the LEFT length) — signatures
  * are always H components, so the guard is defensive only.
  */
case class EstJaccardExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"est_jaccard expects two array<bigint> columns, got ${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Baked at plan time: production signatures are containsNull = false,
    * so the dominant path skips the per-component null bitmap tests.
    */
  private def mayHaveNulls: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    EstJaccardExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], mayHaveNulls)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sql.EstJaccardExpr.compute($a, $b, $mayHaveNulls)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): EstJaccardExpr = copy(left = newLeft, right = newRight)

  override def prettyName: String = "est_jaccard"
}

object EstJaccardExpr {
  /** Static entry point shared by interpreted eval and generated code.
    * When `mayHaveNulls`, a null COMPONENT counts as unequal (the
    * zip_with form's null semantics): getLong on a null slot reads
    * garbage-as-0, and two null slots would otherwise compare 0 == 0 — a
    * silent over-estimate for containsNull inputs the type check accepts.
    * The flag is a plan-time constant from the input ArrayTypes, so the
    * production no-nulls loop carries no per-component bitmap tests.
    */
  def compute(a: ArrayData, b: ArrayData, mayHaveNulls: Boolean): Double = {
    val nA = a.numElements()
    val n = math.min(nA, b.numElements())
    var eq = 0
    var i = 0
    if (mayHaveNulls) {
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) eq += 1
        i += 1
      }
    } else {
      while (i < n) {
        if (a.getLong(i) == b.getLong(i)) eq += 1
        i += 1
      }
    }
    if (nA == 0) 0.0 else eq.toDouble / nA
  }
}
