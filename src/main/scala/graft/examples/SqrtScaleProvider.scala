package graft.examples

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.criteria.ScoringFunctionProvider
import graft.model.Stats

/** Example classpath-discovered scoring function (see
  * [[graft.criteria.ScoringFunctions]]): sqrt-dampened fraction of the
  * cohort maximum. Registered via
  * `META-INF/services/graft.criteria.ScoringFunctionProvider` — the
  * library-jar analogue of dropping a `.py` file in the reference demo's
  * `custom_functions/` directory. IEEE-754 sqrt is correctly rounded, so
  * the score is bit-exact across engines (unlike log-based built-ins). */
final class SqrtScaleProvider extends ScoringFunctionProvider {
  override def name: String = "sqrt_scale"
  override def expr(value: Column, stats: Stats): Column =
    sqrt(value / lit(stats.max)) * lit(100.0)
}
