package graft

import org.apache.spark.sql.graft.{CommonCount, CosineSim, FloatDot, MinHashSig, SimHash16, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Optimizer rule: `size(array_intersect(a, b))` over string arrays →
  * [[CommonCount]] — counts distinct common elements directly instead of
  * materializing the intersection array then measuring it. Value-exact
  * (RuleSpec proves equality), purely a physical-cost rewrite, applied
  * automatically to any user query once the extensions are installed —
  * the pattern shows up in every set-similarity computation (Jaccard).
  *
  * The rewrite requires `containsNull = false` on BOTH inputs:
  * array_intersect treats a shared null element as common, while
  * CommonCount's UTF8String scan does not (and getUTF8String on a null
  * slot is undefined for UnsafeArrayData) — nullable-element arrays keep
  * the built-in form.
  */
object RewriteIntersectCount extends Rule[LogicalPlan] {
  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), _) if isStringArray(a) && isStringArray(b) =>
        CommonCount(a, b)
    }
}

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
      new FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo("org.apache.spark.sql.graft.SimHash64", "graft_simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo("org.apache.spark.sql.graft.MinHashSig", "graft_minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo("org.apache.spark.sql.graft.FloatDot", "graft_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo("org.apache.spark.sql.graft.CosineSim", "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectOptimizerRule(_ => RewriteIntersectCount)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKStrategy)
  }
}
