package graft.testspi

import org.apache.spark.sql.Column

import graft.criteria.ScoringFunctionProvider
import graft.model.Stats

/** Test-classpath provider proving that a jar/classpath entry with a
  * `META-INF/services` registration auto-registers its scoring function
  * (the spec-side analogue of a user's custom jar). */
final class DoubledValueProvider extends ScoringFunctionProvider {
  override def name: String = "test_doubled"
  override def expr(value: Column, stats: Stats): Column = value * 2
}
