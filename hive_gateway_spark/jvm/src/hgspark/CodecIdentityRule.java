package hgspark;

import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.PythonUDF;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.AbstractPartialFunction;

/**
 * Catalyst optimizer rule: inflate_udf(deflate_udf(x)) == x for every
 * binary x (zlib round trip; null maps to null through both), so the
 * nested UDF pair is eliminated from the logical plan before physical
 * planning ever extracts a PythonUDF stage — the JVM-registered form
 * of SURVEY section 4.2d's codec-identity rewrite, which previously
 * existed only as a Python-side expression-build fold (codec_plan).
 *
 * The match is intentionally narrow: exactly the engine's own
 * pandas_udf names ("inflate_udf" over "deflate_udf"), both unary.
 * Runs in the injected "User Provided Optimizers" batch, where
 * pandas UDF calls are still intact PythonUDF expression trees.
 */
public class CodecIdentityRule extends Rule<LogicalPlan> {

  private static boolean isNamedUdf(Expression e, String name) {
    return e instanceof PythonUDF
        && name.equals(((PythonUDF) e).name())
        && ((PythonUDF) e).children().size() == 1;
  }

  private static final AbstractPartialFunction<Expression, Expression> REWRITE =
      new AbstractPartialFunction<Expression, Expression>() {
        @Override
        public boolean isDefinedAt(Expression e) {
          return isNamedUdf(e, "inflate_udf")
              && isNamedUdf((Expression) ((PythonUDF) e).children().head(),
                            "deflate_udf");
        }

        @Override
        public Expression apply(Expression e) {
          PythonUDF inner = (PythonUDF) ((PythonUDF) e).children().head();
          return (Expression) inner.children().head();
        }
      };

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    return (LogicalPlan) plan.transformExpressionsUp(REWRITE);
  }
}
