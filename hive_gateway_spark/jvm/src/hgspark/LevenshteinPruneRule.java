package hgspark;

import org.apache.spark.sql.catalyst.expressions.Abs;
import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Length;
import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Levenshtein;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.Subtract;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.types.IntegerType$;
import scala.runtime.AbstractPartialFunction;

/**
 * Catalyst optimizer rule with edit-distance domain knowledge:
 * levenshtein(a, b) &lt;= k implies |length(a) - length(b)| &lt;= k
 * (each edit changes the length by at most one), so the O(len_a *
 * len_b) DP predicate gains a constant-time length guard in front:
 *
 *   levenshtein(a, b) &lt;= k
 *     ==&gt;  abs(length(a) - length(b)) &lt;= k  AND  k &gt;= levenshtein(a, b)
 *
 * Conjunction evaluation short-circuits, so length-distant candidate
 * pairs (the bulk of a fuzzy join's blocks) never run the DP. The
 * rewritten comparison is emitted FLIPPED (k on the left), which the
 * match pattern ignores - the rule is idempotent by construction and
 * safe under the optimizer batch's fixed-point iteration.
 *
 * Matches only the 2-argument levenshtein with an integer literal
 * bound - exactly the shape q_join_fuzzy's acceptance band produces.
 */
public class LevenshteinPruneRule extends Rule<LogicalPlan> {

  private static final AbstractPartialFunction<Expression, Expression> REWRITE =
      new AbstractPartialFunction<Expression, Expression>() {
        @Override
        public boolean isDefinedAt(Expression e) {
          if (!(e instanceof LessThanOrEqual)) return false;
          LessThanOrEqual cmp = (LessThanOrEqual) e;
          return cmp.left() instanceof Levenshtein
              && ((Levenshtein) cmp.left()).children().size() == 2
              && cmp.right() instanceof Literal
              && ((Literal) cmp.right()).dataType() == IntegerType$.MODULE$;
        }

        @Override
        public Expression apply(Expression e) {
          LessThanOrEqual cmp = (LessThanOrEqual) e;
          Levenshtein lev = (Levenshtein) cmp.left();
          Expression a = (Expression) lev.children().head();
          Expression b = (Expression) lev.children().apply(1);
          Expression guard =
              new LessThanOrEqual(
                  new Abs(new Subtract(new Length(a), new Length(b))),
                  cmp.right());
          return new And(guard, new GreaterThanOrEqual(cmp.right(), lev));
        }
      };

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    return (LogicalPlan) plan.transformExpressionsUp(REWRITE);
  }
}
