package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `grams` kernel
  * (Internal.hs:191-211): normalize (lowercase, keep alnum/space/','),
  * enclose in '-', emit all n-char windows.
  *
  * Exists because the built-in composition
  * `transform(sequence(..), i -> substr(regexp_replace(lower(s)..), i, n))`
  * re-evaluates the regex normalization once PER GRAM — higher-order
  * functions are interpreted and re-run their argument expressions for
  * every lambda element (measured ~70x on the sf0.1 document corpus).
  * Here the whole kernel is one tight pass (single normalization, no
  * regex), and `doGenCode` keeps it inside whole-stage codegen as a
  * static call, so the surrounding explode/join pipeline stays compiled.
  *
  * Semantics are EXACTLY `graft.text.Gram.grams` (golden-tested against
  * the reference suite), so Spark plans and the in-memory oracle can never
  * diverge on normalization.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, "gram size must be at least 2 (Internal.hs:193)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.ShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

object ShinglesExpr {
  /** Static entry point shared by interpreted eval and generated code.
    * Windows are CODE POINTS (Gram.cpStartsOrNull): a window never splits
    * a surrogate pair, so every gram round-trips UTF8String <-> String
    * losslessly — identical to Gram.grams on every input.
    */
  def compute(u: UTF8String, n: Int): ArrayData = {
    val s = graft.text.Gram.enclosedIn(graft.text.Gram.normalized(u.toString), '-')
    val starts = graft.text.Gram.cpStartsOrNull(s)
    val count = graft.text.Gram.windowCount(s, starts, n)
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val arr = new Array[Any](count)
      var i = 0
      while (i < count) {
        arr(i) = UTF8String.fromString(graft.text.Gram.window(s, starts, i, n))
        i += 1
      }
      new GenericArrayData(arr)
    }
  }
}
