package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: makes the graft native expressions
  * first-class SQL functions in any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (spark-submit/cluster) —
  * the packaged twin of VectorFunctions.register, which operators call for
  * sessions created without the config. Both surfaces iterate the SAME
  * builder table (VectorFunctions.builders), so they cannot drift. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.plans.VectorFunctions.builders.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.IntersectRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
