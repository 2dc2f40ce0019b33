package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string's UTF-8 bytes:
  * h ← h·1000003 + byte  (wrapping in 64 bits).
  *
  * A native Catalyst expression with whole-stage codegen — this is the
  * "document fingerprinting (rolling hash)" extension operator, kept
  * codegen-friendly so fingerprinting 100 TB of documents stays inside
  * WholeStageCodegen instead of falling back to an interpreted UDF.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 1000003L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column API: rolling_hash(text) */
  def apply(c: Column): Column =
    CatalystBridge.column(RollingHash(CatalystBridge.expression(c)))

  /** Driver-side evaluation of the SAME fold — for bounded off-plan
    * artifacts (the consistent-hash vnode ring) that must hash
    * identically to the plan-level expression. Plain Scala Long
    * arithmetic wraps (driver code is outside ANSI), which is exactly
    * the expression's defined semantics. */
  def evalString(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xff); i += 1 }
    h
  }

  /** Register as a SQL function (`SELECT rolling_hash(text) …`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
}
