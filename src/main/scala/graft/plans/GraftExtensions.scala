package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{DotProductF, HeavyHitters}

/** SparkSessionExtensions entry point: installs the engine's native
  * expressions at session build time, so a deployment enables the whole
  * surface with `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions`) instead of per-query registration. The
  * per-query `VectorExpressions.register` path stays as a fallback
  * because the driver contract may hand query functions a session built
  * without extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      children => {
        require(children.length == 2,
          s"dot_f expects exactly 2 arguments, got ${children.length}")
        DotProductF(children(0), children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("heavy_hitters"), HeavyHitters.info, HeavyHitters.build))
  }
}
