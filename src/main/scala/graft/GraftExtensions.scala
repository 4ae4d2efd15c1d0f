package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.CosineSimilarity

/** Catalyst extension entry point: registers the engine's native
  * functions for the SQL surface. Install at session build
  * (`.withExtensions(new GraftExtensions)`) or via
  * `spark.sql.extensions=graft.GraftExtensions` on spark-submit —
  * after which `SELECT graft_cosine(a, b)` works in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "graft_cosine",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest",
          ),
        )
      CosineSimilarity(children(0), children(1))
    },
  )
}
