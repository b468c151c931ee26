package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature + SimHash fingerprint + LSH band tokens of one row's
  * gram multiset (array<string>), in one tight pass — the index build's
  * per-row kernel.
  *
  * Native instead of a UDF because this runs once per corpus row over
  * ~|key| grams: the `Seq[String]` UDF it replaces decoded every UTF8String
  * gram into a JVM String and boxed the three outputs through the
  * Scala-to-Catalyst converter — at bench scale the signature stage's wall
  * was ~85% GC. Here grams hash straight from their UTF-8 bytes
  * (PortableHash.SigState — md5 over UTF-8 is what the DuckDB oracle
  * computes, so values are bit-identical to the md5 column expressions and
  * the Seq[String] path, both parity-pinned).
  */
case class SigBandsExpr(child: Expression, numHashes: Int, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands * rowsPerBand <= numHashes,
    s"bands($bands) x rowsPerBand($rowsPerBand) must fit in the signature ($numHashes)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sig_bands expects an array<string> column, got ${t.catalogString}")
    }

  override def dataType: DataType = SigBandsExpr.OutType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // gram-less rows -> null

  override def nullSafeEval(input: Any): Any =
    SigBandsExpr.compute(input.asInstanceOf[ArrayData], numHashes, bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = (InternalRow) graft.sql.SigBandsExpr.compute(
        $c, $numHashes, $bands, $rowsPerBand);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): SigBandsExpr =
    copy(child = newChild)

  override def prettyName: String = "sig_bands"
}

object SigBandsExpr {
  val OutType: StructType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("simhash", LongType, nullable = false),
    StructField("band_hashes", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Static entry point shared by interpreted eval and generated code.
    * Declared InternalRow (not Any/Object): defineCodeGen assigns the call
    * result to an InternalRow-typed variable and Janino has no implicit
    * Object→InternalRow conversion — an Any return type made the generated
    * class fail to compile and silently fell back to interpreted eval.
    */
  def compute(grams: ArrayData, numHashes: Int, bands: Int, rowsPerBand: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val n = grams.numElements()
    // NULL for a gram-less row, matching SigBandsFromKeyExpr: the folded
    // state of zero grams is a CONSTANT (all-MaxValue signature, simhash
    // 0), so every empty row would share identical band tokens — one
    // quadratic LSH bucket per band on a corpus with many empty keys. The
    // SQL surface (graft_sig_bands) reaches this without the index build's
    // size(grams) > 0 guard.
    if (n == 0) return null
    val state = new PortableHash.SigState(numHashes)
    // minhash needs first-occurrence detection over the multiset; dedup on
    // the UTF8String directly (byte-wise equals/hashCode), no String decode
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      val g = grams.getUTF8String(i)
      state.add(g.getBytes, seen.add(g))
      i += 1
    }
    pack(state, bands, rowsPerBand)
  }

  /** (sig, simhash, band_hashes) struct from a folded state — shared with
    * [[SigBandsFromKeyExpr]].
    */
  private[sql] def pack(state: PortableHash.SigState, bands: Int, rowsPerBand: Int): GenericInternalRow = {
    val row = new GenericInternalRow(3)
    row.update(0, new GenericArrayData(state.sig))
    row.setLong(1, state.simhash)
    row.update(2, new GenericArrayData(PortableHash.bandHashes(state.sig, bands, rowsPerBand)))
    row
  }
}
