package graft.criteria

import org.apache.spark.sql.Column

import graft.model.Stats

/** SPI for classpath-discovered scoring functions — the JVM analogue of
  * the reference demo's dynamic function loading
  * (`/root/reference/streamlit_demo.py:56-86`: import every `*.py` in
  * `custom_functions/`, keep callables with >= 2 positional args, register
  * each under its function name).
  *
  * A JVM library with no egress can't safely import arbitrary script
  * files, so the equivalent extension point is `java.util.ServiceLoader`:
  * package an implementation of this trait in any jar, list the class in
  * `META-INF/services/graft.criteria.ScoringFunctionProvider`, drop the
  * jar on the classpath, and the function is selectable by name through
  * `Evaluator.custom(column, weight, name)` exactly like a built-in.
  */
trait ScoringFunctionProvider {

  /** Registry key, like the reference's function `__name__`. */
  def name: String

  /** The scoring expression: value column + cohort stats -> unweighted
    * score column (the criterion applies the weight). */
  def expr(value: Column, stats: Stats): Column
}

/** Name -> function registry combining [[BuiltinCustom]] with every
  * classpath-discovered [[ScoringFunctionProvider]]. */
object ScoringFunctions {

  /** Discovered providers, loaded once per JVM. On duplicate names the
    * later classpath entry wins — mirroring the demo's dict-update
    * import loop, where the last module to define a name owns it.
    *
    * Loads through the thread context classloader (falling back to the
    * SPI's own): Spark ships `--jars`/`spark.jars` entries in a child
    * MutableURLClassLoader that the library's defining loader cannot see,
    * and user provider jars arrive exactly that way. One broken
    * registration (stale class name, throwing constructor) is logged and
    * skipped instead of poisoning every lookup including the built-ins. */
  lazy val discovered: Map[String, (Column, Stats) => Column] = {
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[ScoringFunctionProvider].getClassLoader)
    import scala.jdk.CollectionConverters._
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (Column, Stats) => Column]
    // stream() defers class loading/instantiation to Provider.get(), so a
    // bad entry throws inside OUR try per provider (the raw iterator()'s
    // hasNext can throw and would be unsafe to loop over)
    java.util.ServiceLoader.load(classOf[ScoringFunctionProvider], loader)
      .stream().iterator().asScala.foreach { prov =>
        try {
          val p = prov.get()
          out.put(p.name, (v: Column, s: Stats) => p.expr(v, s))
        } catch {
          case e: Throwable =>
            System.err.println(s"[graft] skipping broken ScoringFunctionProvider: ${e.getMessage}")
        }
      }
    out.toMap
  }

  /** All selectable names, built-in and discovered. */
  def names: Seq[String] =
    (BuiltinCustom.functions.keySet ++ discovered.keySet).toSeq.sorted

  /** Resolve a function by name; discovered providers shadow built-ins
    * (a user dropping a jar on the classpath expects their version to
    * apply, like a `custom_functions/` module shadowing a demo default). */
  def apply(funcName: String): (Column, Stats) => Column =
    discovered.getOrElse(funcName,
      BuiltinCustom.functions.getOrElse(funcName,
        throw new IllegalArgumentException(
          s"Unknown scoring function: $funcName. " +
            s"Available: ${names.mkString("[", ", ", "]")}")))
}
