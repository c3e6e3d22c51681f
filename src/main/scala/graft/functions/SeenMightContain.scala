package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}

import graft.seen.SeenFilter

/** Native membership probe against a prebuilt seen-set filter (Bloom bank /
  * Bloom / cuckoo) — the codegen'd replacement for the per-row Scala UDF
  * probe. The filter rides the plan as a codegen reference object (one per
  * stage, broadcast with the task binary), so the generated code is a
  * single virtual call per row with no closure serialization or boxing.
  */
case class SeenMightContain(child: Expression, filter: SeenFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(v: Any): Any = filter.mightContain(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seenFilter", filter, classOf[SeenFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): SeenMightContain =
    copy(child = newChild)

  override def prettyName: String = "graft_seen_contains"
}

object SeenMightContain {

  /** Column form: probes `key` against `filter` through the native
    * expression. Resolution goes through a session temp function (the
    * public route to a custom expression in a Column), named per filter
    * identity so repeated calls reuse the registration. */
  def mightContain(spark: SparkSession, key: Column, filter: SeenFilter): Column = {
    val name = s"graft_seen_contains_${System.identityHashCode(filter).toHexString}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      exprs => SeenMightContain(exprs.head, filter), "scala_udf")
    call_function(name, key)
  }
}
