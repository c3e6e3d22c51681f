package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers every graft native function at
  * session build time, so a spark-submit user gets the SQL surface with
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * and a programmatic user with `.withExtensions(new GraftExtensions)`.
  * This is the engine's analogue of the reference's plugin registry
  * (plugin.includes + Extension points, reference
  * src/main/java/org/apache/nutch/plugin/PluginRepository.java): the
  * extension surface is declared once and the session wires it, instead of
  * each call site invoking `register(spark)` (those remain for REPL use).
  *
  * Injected functions are the same codegen'd expressions the jobs use —
  * injecting at the extension level (vs temp functions) also makes them
  * visible to every session derived from the builder, including
  * `newSession()` clones.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "",
      "", "", "", "scala_udf")

  private def inject(ext: SparkSessionExtensions, name: String, usage: String)(
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    import Exprs._
    inject(ext, "graft_uuid3", "uuid3(url) storage key")(e => Uuid3(e.head))
    inject(ext, "graft_normalize_url", "URL normalizer chain")(e => NormalizeUrl(e.head))
    inject(ext, "graft_reverse_url", "com.example:http/path key order")(e =>
      ReverseUrl(e.head))
    inject(ext, "graft_reverse_host", "host -> reversed-domain")(e => ReverseHost(e.head))
    inject(ext, "graft_tld", "public suffix of the url's host")(e => TldOf(e.head))
    inject(ext, "graft_domain", "host without subdomains")(e => DomainOf(e.head))
  }
}
