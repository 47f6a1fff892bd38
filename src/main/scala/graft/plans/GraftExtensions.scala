package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: custom Catalyst functions, registered
  * either at session build time (`.withExtensions(new GraftExtensions)`
  * / `spark.sql.extensions=graft.plans.GraftExtensions`) or onto an
  * existing session with [[GraftFunctions.register]].
  */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.CosineSimilarityExpr].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_cosine(a, b) takes two array<float> arguments")
        org.apache.spark.sql.graft.CosineSimilarityExpr(children.head, children(1))
      }))

  /** Register onto a live session (covers sessions the caller did not
    * build, e.g. a driver-provided one).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `SparkSessionExtensions` installer — the cluster-side wiring
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
