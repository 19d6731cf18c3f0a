package graft

import org.apache.spark.sql.graft.{FloatDot, MinHashSig, SimHash16}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT graft_dot(a,b)")`
  * works for SQL users. Enable via
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  * (DataFrame callers go through [[graft.functions.VectorOps]] /
  * [[graft.functions.TextOps]], which bind the expressions directly.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash16"),
      new ExpressionInfo("org.apache.spark.sql.graft.SimHash16", "graft_simhash16"),
      (children: Seq[Expression]) => SimHash16(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo("org.apache.spark.sql.graft.MinHashSig", "graft_minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo("org.apache.spark.sql.graft.FloatDot", "graft_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1))))
  }
}
