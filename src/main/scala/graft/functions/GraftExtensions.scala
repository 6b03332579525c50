package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst integration point: registers graft's native expressions as SQL
  * functions via `SparkSessionExtensions`, so `spark.sql` pipelines (and any
  * SQL-speaking client of the session) can call them directly:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  *   spark.sql("SELECT graft_polyhash(text) FROM docs")
  *   spark.sql("SELECT graft_sorted_intersect_count(a, b) FROM pairs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      info("graft_polyhash",
        "graft_polyhash(str) - cross-engine polynomial codepoint hash mod 2^32"),
      (children: Seq[Expression]) => PolyHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count",
        "graft_sorted_intersect_count(a, b) - |A ∩ B| of sorted long arrays"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy",
        "graft_char_entropy(str) - Shannon entropy in bits per codepoint"),
      (children: Seq[Expression]) => CharEntropy(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_parts"),
      info("graft_simhash_parts",
        "graft_simhash_parts(tokens, words) - wide SimHash as words x 32-bit parts"),
      (children: Seq[Expression]) => {
        val words = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_simhash_parts: words must be an int literal, got $other")
        }
        SimHashParts(children.head, words)
      }))
  }
}
