package hgspark;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import scala.runtime.BoxedUnit;

/**
 * spark.sql.extensions entry point: injects {@link CodecIdentityRule}
 * into the session optimizer. Scala's Function1 is a SAM interface in
 * 2.13, so plain Java classes satisfy both the extension contract and
 * the rule-builder argument.
 */
public class CodecExtensions
    implements scala.Function1<SparkSessionExtensions, BoxedUnit> {

  private static final class CodecBuilder
      implements scala.Function1<SparkSession, Rule<LogicalPlan>> {
    @Override
    public Rule<LogicalPlan> apply(SparkSession session) {
      return new CodecIdentityRule();
    }
  }

  private static final class LevenshteinBuilder
      implements scala.Function1<SparkSession, Rule<LogicalPlan>> {
    @Override
    public Rule<LogicalPlan> apply(SparkSession session) {
      return new LevenshteinPruneRule();
    }
  }

  @Override
  public BoxedUnit apply(SparkSessionExtensions extensions) {
    extensions.injectOptimizerRule(new CodecBuilder());
    extensions.injectOptimizerRule(new LevenshteinBuilder());
    return BoxedUnit.UNIT;
  }
}
