package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{DotProduct, SortedIntersectCount}

/**
 * Library entry point for `spark.sql.extensions=graft.GraftExtensions`:
 * injects graft's native SQL functions into every session the context
 * builds — including sessions the application code never touches (Spark
 * Connect / thrift-server sessions), where calling
 * [[graft.expressions.DotProduct.register]] by hand is impossible.
 *
 * Injection happens at session construction, so the functions behave like
 * built-ins: visible in `SHOW FUNCTIONS`, resolvable from pure SQL, and
 * codegen'd like any Catalyst expression.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** The injected function set, shared with the test bridge. */
  private[graft] val functions: Seq[
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => DotProduct(a, b)
        case other => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`graft_dot`",
            "expectedNum" -> "2",
            "actualNum" -> other.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }),
    (FunctionIdentifier("graft_sorted_intersect"),
      // The usage text carries the PRECONDITION a SQL caller cannot see
      // from the name: this is the dedup verify kernel, correct only on
      // sorted inputs — on arbitrary arrays it silently undercounts.
      new ExpressionInfo(classOf[SortedIntersectCount].getName, null,
        "graft_sorted_intersect",
        "graft_sorted_intersect(a, b) - Count of common elements between " +
          "two INT arrays (array<int>) that MUST each be sorted ascending, " +
          "distinct and non-null (the precondition is not checked; " +
          "unsorted input silently undercounts). Intended for graft's " +
          "dedup kernels — for arbitrary arrays use " +
          "size(array_intersect(a, b)).",
        ""),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case other => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "`graft_sorted_intersect`",
            "expectedNum" -> "2",
            "actualNum" -> other.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }))
}
