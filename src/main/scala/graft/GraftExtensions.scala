package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{CharShinglesExpr, CosineSimilarity, IdPairsExpr, MinHashSigExpr, PostingPairsExpr, SimHash16Expr, SimHash64Expr, SumScaled128, WordShinglesExpr}

/** Catalyst extension entry point: registers the engine's native
  * functions for the SQL surface. Install at session build
  * (`.withExtensions(new GraftExtensions)`) or via
  * `spark.sql.extensions=graft.GraftExtensions` on spark-submit —
  * after which `SELECT graft_cosine(a, b)`, `graft_simhash64(text)`,
  * `graft_word_shingles(text, 3)` etc. work in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  private def wrongArgs(name: String, expected: String, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> name,
        "expectedNum" -> expected,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest",
      ),
    )

  /** A literal-int argument (shingle size, hash count): SQL callers
    * pass constants; anything else is an analysis error.
    */
  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other =>
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters =
          Map("message" -> s"$name expects a literal INT argument, got ${other.sql}"),
      )
  }

  private def desc(
      name: String,
      clazz: Class[_],
      build: Seq[Expression] => Expression,
  ): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build)

  val cosineDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    desc("graft_cosine", classOf[CosineSimilarity], {
      case Seq(a, b) => CosineSimilarity(a, b)
      case cs        => wrongArgs("graft_cosine", "2", cs.length)
    })

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    cosineDescriptor,
    desc("graft_simhash16", classOf[SimHash16Expr], {
      case Seq(t) => SimHash16Expr(t)
      case cs     => wrongArgs("graft_simhash16", "1", cs.length)
    }),
    desc("graft_simhash64", classOf[SimHash64Expr], {
      case Seq(t) => SimHash64Expr(t)
      case cs     => wrongArgs("graft_simhash64", "1", cs.length)
    }),
    desc("graft_minhash_sig", classOf[MinHashSigExpr], {
      case Seq(sh, n) => MinHashSigExpr(sh, litInt("graft_minhash_sig", n))
      case cs         => wrongArgs("graft_minhash_sig", "2", cs.length)
    }),
    desc("graft_word_shingles", classOf[WordShinglesExpr], {
      case Seq(t, k) => WordShinglesExpr(t, litInt("graft_word_shingles", k))
      case cs        => wrongArgs("graft_word_shingles", "2", cs.length)
    }),
    desc("graft_char_shingles", classOf[CharShinglesExpr], {
      case Seq(t, k) => CharShinglesExpr(t, litInt("graft_char_shingles", k))
      case cs        => wrongArgs("graft_char_shingles", "2", cs.length)
    }),
    desc("graft_posting_pairs", classOf[PostingPairsExpr], {
      case Seq(ds) => PostingPairsExpr(ds)
      case cs      => wrongArgs("graft_posting_pairs", "1", cs.length)
    }),
    desc("graft_id_pairs", classOf[IdPairsExpr], {
      case Seq(ids) => IdPairsExpr(ids)
      case cs       => wrongArgs("graft_id_pairs", "1", cs.length)
    }),
    desc("graft_sum_scaled128", classOf[SumScaled128], {
      case Seq(v) => SumScaled128(v).toAggregateExpression()
      case cs     => wrongArgs("graft_sum_scaled128", "1", cs.length)
    }),
  )
}
