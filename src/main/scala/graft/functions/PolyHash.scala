package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Catalyst expression for the engine's deterministic
  * string hash: Java-style 31-polynomial over Unicode code points, mod
  * 2^31-1 ([[TextAnalysis.P]]).
  *
  * Semantically identical to the composed-built-ins form
  * `aggregate(regexp_extract_all(s,'.'), 0L, (a,c) -> (a*31+ascii(c)) % P)`
  * (and to the DuckDB oracle's `list_reduce`), but runs as a single tight
  * whole-stage-codegen loop instead of: regex scan → array materialization →
  * interpreted per-element lambda. This is the hot inner loop of every
  * shingle/MinHash/fingerprint pipeline — at 100 TB it's executed per gram,
  * so it must stay inside codegen.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash requires STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "polyhash"
}

object PolyHash {
  /** The scalar loop — shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    val p = TextAnalysis.P
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % p
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column API — resolves through the function registry, so
    * [[ensureRegistered]] must have run on the analyzing session (the
    * [[graft.Tables]] loaders guarantee it for every query path). */
  def apply(c: Column): Column = call_function("polyhash", c)

  /** Idempotent per-session registration (also enables SQL `polyhash(s)`). */
  def ensureRegistered(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("polyhash", exprs => PolyHash(exprs.head),
        "built-in")
}
