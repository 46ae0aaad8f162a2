package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classification evaluation metrics over (label, prediction) frames —
  * the measurement step after any labeling pipeline stage (kNN label
  * propagation, the [[Classifier]] gate, dedup-cluster audits). All
  * metrics derive from EXACT integer confusion counts, so every number
  * is order-independent and engine-mirrorable.
  *
  * Scale shape: one groupBy over the data for the confusion counts; the
  * per-class report is assembled by joins over |classes|-row frames.
  */
object Metrics {

  /** (label, prediction, n) confusion counts. Null labels/predictions
    * group like any other value — callers decide whether to filter. */
  def confusionMatrix(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))

  /** Per-class `support`, `tp`, `precision`, `recall`, `f1`. Classes are
    * the union of observed labels and predictions; a class never
    * predicted has null precision (0/0), a class never seen as truth has
    * null recall — nulls, not zeros, because the ratio is undefined. */
  def classificationReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val cm = confusionMatrix(df, labelCol, predCol)
    val rowSums = cm.groupBy("label").agg(sum("n").as("__row"))
      .select(col("label").as("clazz"), col("__row"))
    val colSums = cm.groupBy("pred").agg(sum("n").as("__col"))
      .select(col("pred").as("clazz"), col("__col"))
    val diag = cm.filter(col("label") === col("pred"))
      .select(col("label").as("clazz"), col("n").as("__tp"))
    val joined = rowSums
      .join(colSums, Seq("clazz"), "full")
      .join(diag, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("__row"), lit(0L)).as("support"),
        coalesce(col("__col"), lit(0L)).as("__predicted"),
        coalesce(col("__tp"), lit(0L)).as("tp"))
    val p = when(col("__predicted") > 0, col("tp").cast("double") / col("__predicted"))
    val r = when(col("support") > 0, col("tp").cast("double") / col("support"))
    joined
      .withColumn("precision", p)
      .withColumn("recall", r)
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall"))))
      .drop("__predicted")
  }
}
