package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}

import graft.url.AutomatonUrlFilter

/** Codegen'd URL-filter predicate: runs the DFA rule chain per row inside
  * whole-stage codegen (one O(|url|) automaton pass per rule until first
  * match — no backtracking regex, no UDF closure). */
case class UrlFilterAccepts(child: Expression, filter: AutomatonUrlFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(v: Any): Any = filter.accepts(v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("urlFilter", filter, classOf[AutomatonUrlFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.accepts($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): UrlFilterAccepts =
    copy(child = newChild)

  override def prettyName: String = "graft_urlfilter_accepts"
}

object UrlFilterAccepts {
  /** Column form, resolved through a per-filter session temp function. */
  def accepts(spark: SparkSession, url: Column, filter: AutomatonUrlFilter): Column = {
    val name = s"graft_urlfilter_accepts_${System.identityHashCode(filter).toHexString}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      exprs => UrlFilterAccepts(exprs.head, filter), "scala_udf")
    call_function(name, url)
  }
}
