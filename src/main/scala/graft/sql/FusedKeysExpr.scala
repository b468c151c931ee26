package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The fused candidate-generation key list of one row: its LSH band tokens
  * (ktype 0) followed by its four 15-bit SimHash chunk keys (ktype 1), as
  * array<struct<bkey, ktype>> ready to explode into the bucket self-join.
  *
  * Native instead of a UDF because this explode is the flagship's largest
  * row fanout (bands + 4 keys per corpus row): the tuple-returning UDF it
  * replaces boxed the band array in and a Tuple2 per key out through the
  * Scala converter. Key VALUES are unchanged — band hashes pass through
  * verbatim, chunk keys are the same shifted 15-bit slices offset by
  * c << 15 (see Candidates.chunkKey) — so bucket contents, and therefore
  * the emitted pair set, still match the separate lshPairs/simhashPairs
  * passes exactly (CandidatesSpec pins the union equality).
  */
case class FusedKeysExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fused_keys expects (array<bigint>, bigint), got ${l.catalogString} / ${r.catalogString}")
    }

  override def dataType: DataType = FusedKeysExpr.OutType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(bands: Any, simhash: Any): Any =
    FusedKeysExpr.compute(bands.asInstanceOf[ArrayData], simhash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s) => s"graft.sql.FusedKeysExpr.compute($b, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): FusedKeysExpr = copy(left = newLeft, right = newRight)

  override def prettyName: String = "fused_keys"
}

object FusedKeysExpr {
  val OutType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("bkey", LongType, nullable = false),
      StructField("ktype", IntegerType, nullable = false))),
    containsNull = false)

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(bands: ArrayData, simhash: Long): ArrayData = {
    val nb = bands.numElements()
    val out = new Array[Any](nb + 4)
    var i = 0
    while (i < nb) {
      val row = new GenericInternalRow(2)
      row.setLong(0, bands.getLong(i))
      row.setInt(1, 0)
      out(i) = row
      i += 1
    }
    var c = 0
    while (c < 4) {
      val row = new GenericInternalRow(2)
      row.setLong(0, ((simhash >>> (15 * c)) & 0x7fffL) + (c.toLong << 15))
      row.setInt(1, 1)
      out(nb + c) = row
      c += 1
    }
    new GenericArrayData(out)
  }
}
