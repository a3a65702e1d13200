package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` injector — the config-time registration path:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes every engine
  * SQL function (vec_euclid, vec_cosine, int8_dot, hamming_dist,
  * rect_min_dist) available in all sessions of the application, the way a
  * cluster deployment would wire the library in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}
