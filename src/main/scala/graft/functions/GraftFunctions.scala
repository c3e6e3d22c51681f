package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.url.{UrlNormalizers, UrlPartitioner, UrlUtil}

/** Native Catalyst expressions for the engine's scalar URL functions —
  * codegen'd static calls rather than Scala UDF closures, so they stay
  * inside WholeStageCodegen with no serialization penalty (SURVEY.md §4
  * "budget a custom expression for uuid3(url)").
  */
object Exprs {

  /** uuid3(url): the deterministic storage key. */
  case class Uuid3(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(v: Any): Any =
      UTF8String.fromString(UrlUtil.uuid3(v.toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString(graft.url.UrlUtil.uuid3($c.toString()))")
    override protected def withNewChildInternal(newChild: Expression): Uuid3 =
      copy(child = newChild)
    override def prettyName: String = "graft_uuid3"
  }

  /** normalize(url): basic+regex normalizer chain; null for malformed urls. */
  case class NormalizeUrl(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any = {
      val r = UrlNormalizers.normalize(v.toString)
      if (r == null) null else UTF8String.fromString(r)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val r = ctx.freshName("norm")
      nullSafeCodeGen(ctx, ev, c =>
        s"""String $r = graft.url.UrlNormalizers.normalize($c.toString(),
           |  graft.url.UrlNormalizers.ScopeDefault());
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = UTF8String.fromString($r); }""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): NormalizeUrl =
      copy(child = newChild)
    override def prettyName: String = "graft_normalize_url"
  }

  /** reverse_url(url): the host-reversed storage ordering key. */
  case class ReverseUrl(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      try UTF8String.fromString(UrlUtil.reverseUrl(v.toString))
      catch { case _: Exception => null }
    override protected def withNewChildInternal(newChild: Expression): ReverseUrl =
      copy(child = newChild)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      nullSafeCodeGen(ctx, ev, c =>
        s"""try { ${ev.value} = UTF8String.fromString(
           |  graft.url.UrlUtil.reverseUrl($c.toString())); }
           |catch (Exception e) { ${ev.isNull} = true; }""".stripMargin)
    }
    override def prettyName: String = "graft_reverse_url"
  }

  /** reverse_host(url): the hostdb grouping key — reversed host of the url
    * (HostDbUpdateJob groups by TableUtil.reverseHost). */
  case class ReverseHost(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      try UTF8String.fromString(UrlUtil.reverseHost(UrlUtil.getHost(v.toString)))
      catch { case _: Exception => null }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""try { ${ev.value} = UTF8String.fromString(
           |  graft.url.UrlUtil.reverseHost(graft.url.UrlUtil.getHost($c.toString()))); }
           |catch (Exception e) { ${ev.isNull} = true; }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): ReverseHost =
      copy(child = newChild)
    override def prettyName: String = "graft_reverse_host"
  }

  /** tld(url): the host's public suffix by the reference's suffix walk
    * (URLUtil.getDomainSuffix — the `tld` doc field of the tld plugin);
    * null for IPs, unknown suffixes and malformed urls. */
  case class TldOf(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any = {
      val r = UrlUtil.getDomainSuffix(v.toString)
      if (r == null) null else UTF8String.fromString(r)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val r = ctx.freshName("tld")
      nullSafeCodeGen(ctx, ev, c =>
        s"""String $r = graft.url.UrlUtil.getDomainSuffix($c.toString());
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = UTF8String.fromString($r); }""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): TldOf =
      copy(child = newChild)
    override def prettyName: String = "graft_tld"
  }

  /** domain(url): hostname without subdomains, public-suffix aware
    * (URLUtil.getDomainName). */
  case class DomainOf(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      try UTF8String.fromString(UrlUtil.getDomainName(v.toString))
      catch { case _: Exception => null }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""try { ${ev.value} = UTF8String.fromString(
           |  graft.url.UrlUtil.getDomainName($c.toString())); }
           |catch (Exception e) { ${ev.isNull} = true; }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): DomainOf =
      copy(child = newChild)
    override def prettyName: String = "graft_domain"
  }

  /** host_partition(url, n, seed): the salted host partitioner as a column. */
  case class HostPartition(child: Expression, numPartitions: Int, seed: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(v: Any): Any =
      UrlPartitioner.getPartition(v.toString, numPartitions, seed).toLong
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"(long) graft.url.UrlPartitioner.simplePartition($c.toString(), $numPartitions, $seed)")
    override protected def withNewChildInternal(newChild: Expression): HostPartition =
      copy(child = newChild)
    override def prettyName: String = "graft_host_partition"
  }
}

object GraftFunctions {
  import Exprs._

  /** Register the functions for SQL use: graft_uuid3, graft_normalize_url,
    * graft_reverse_url. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_uuid3",
      exprs => Uuid3(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_normalize_url",
      exprs => NormalizeUrl(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_reverse_url",
      exprs => ReverseUrl(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_reverse_host",
      exprs => ReverseHost(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_tld",
      exprs => TldOf(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_domain",
      exprs => DomainOf(exprs.head), "scala_udf")
  }

  /** Column faces of the URL expressions (registered per-session so the
    * analyzer can resolve them; idempotent). */
  def tldOf(spark: SparkSession, url: Column): Column = {
    register(spark); call_function("graft_tld", url)
  }
  def domainOf(spark: SparkSession, url: Column): Column = {
    register(spark); call_function("graft_domain", url)
  }
}
