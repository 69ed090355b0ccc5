package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** 32-bit random-hyperplane (SRP) signature per embedding: bit j is set
  * iff the vector's index-ordered dot product with pseudo-random plane j
  * is positive, planes derived from the immutable
  * [[TextAnalysis.HplaneA]]/[[TextAnalysis.HplaneB]] constants as
  * `((a_j·i + b_j) mod P)/P − 0.5` over 1-based coordinates — exactly
  * [[HyperplaneBucket]]'s construction widened from 8 planes to 32, so
  * the signature's LOW BYTE is bitwise the 8-plane bucket (spec-pinned)
  * and the whole signature is replayable in SQL from the same constants.
  *
  * 32 planes is what makes BANDING work: byte bands of an 8-bit bucket
  * collide a quarter of a random corpus, while 4×8-bit bands of this
  * signature admit a pair iff some band matches — by pigeonhole every
  * pair within signature-Hamming 3 shares a band (exact candidate
  * recall at that radius; per-plane disagreement probability is
  * angle/π, the SRP-LSH contract). One fused 32×dim loop per row, inside
  * whole-stage codegen — the composed per-plane HOF form pays 32
  * interpreted folds per row.
  *
  * Null/malformed contract mirrors [[HyperplaneBucket]]: a null element
  * zeroes every projection in the composed form, so the signature is 0.
  */
case class HyperplaneSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig requires ARRAY<DOUBLE> input, got ${t.catalogString}")
    }

  private def elementsMayBeNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], elementsMayBeNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSig.compute($c, $elementsMayBeNull)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig"
}

object HyperplaneSig {
  val Bits = 32

  def compute(v: ArrayData, checkNulls: Boolean): Long = {
    val p = TextAnalysis.P
    val pd = p.toDouble
    val a = TextAnalysis.HplaneA
    val b = TextAnalysis.HplaneB
    val n = v.numElements()
    if (checkNulls) {
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return 0L
        i += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < Bits) {
      var acc = 0.0
      var i = 1 // 1-based index, matching the composed sequence(1, size) form
      while (i <= n) {
        val h = ((a(j) * i + b(j)) % p).toDouble / pd - 0.5
        acc += h * v.getDouble(i - 1)
        i += 1
      }
      if (acc > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  def apply(c: Column): Column = call_function("hyperplane_sig", c)

  def ensureRegistered(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("hyperplane_sig",
        exprs => HyperplaneSig(exprs.head), "built-in")
}
