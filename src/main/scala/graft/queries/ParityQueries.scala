package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Evaluator, StagedEvaluator}
import graft.config.ConfigLoader
import graft.templates.Templates

/** Oracle-checked queries exercising the reference-parity surface
  * (SURVEY.md §2.1-2.4) against the shared parquet testdata.
  *
  * Every query pairs with ANSI SQL (run by the driver in DuckDB over the
  * SAME tables) that mirrors the engine's arithmetic op-for-op: with
  * identical IEEE-754 operation order, min/max-parameterized criteria are
  * bit-exact across engines, so results hash-match without tolerance.
  * Statistics whose value depends on summation order (mean/stddev) are
  * only used in queries that round their outputs (and omit rank-on-them).
  *
  * All queries ORDER BY a unique key so row order is deterministic in both
  * engines (Spark's sort is not stable; ties must be broken explicitly).
  */
object ParityQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.io.Tables.table(spark, dir, name)

  // --------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_linear" -> { (s, dir) =>
      new Evaluator()
        .linear("s_acctbal", 1.0)
        .evaluate(t(s, dir, "supplier"))
        .select("s_suppkey", "s_acctbal", "score_s_acctbal", "final_score", "ranking")
        .orderBy("ranking", "s_suppkey")
    },

    "q02_linear_inverted" -> { (s, dir) =>
      new Evaluator()
        .linear("c_acctbal", 0.5, higherIsBetter = false)
        .evaluate(t(s, dir, "customer"))
        .select("c_custkey", "score_c_acctbal", "final_score", "ranking")
        .orderBy("ranking", "c_custkey")
    },

    "q03_threshold_bands" -> { (s, dir) =>
      new Evaluator()
        .threshold("p_size", 2.0, Seq(
          (1.0, 10.0, 40.0), (10.0, 25.0, 60.0), (25.0, 40.0, 80.0), (40.0, 100.0, 100.0)))
        .evaluate(t(s, dir, "part"))
        .select("p_partkey", "p_size", "score_p_size", "final_score", "ranking")
        .orderBy("ranking", "p_partkey")
    },

    "q04_direct_scaled" -> { (s, dir) =>
      new Evaluator()
        .direct("c_acctbal", 1.0, inputScale = 10000.0)
        .evaluate(t(s, dir, "customer"))
        .select("c_custkey", "score_c_acctbal", "final_score", "ranking")
        .orderBy("ranking", "c_custkey")
    },

    "q05_min_ratio" -> { (s, dir) =>
      new Evaluator()
        .minRatio("p_retailprice", 1.0)
        .evaluate(t(s, dir, "part"))
        .select("p_partkey", "score_p_retailprice", "final_score", "ranking")
        .orderBy("ranking", "p_partkey")
    },

    "q06_formula_minmax" -> { (s, dir) =>
      new Evaluator()
        .formula("o_totalprice", 1.0, formula = "(value - min) / (max - min) * 100")
        .evaluate(t(s, dir, "orders"))
        .select("o_orderkey", "score_o_totalprice", "final_score", "ranking")
        .orderBy("ranking", "o_orderkey")
    },

    "q07_formula_vars" -> { (s, dir) =>
      new Evaluator()
        .formula("c_acctbal", 1.0,
          formula = "clip(value / target * 100, 0, 100)",
          variables = Map("target" -> 5000.0))
        .evaluate(t(s, dir, "customer"))
        .select("c_custkey", "score_c_acctbal", "final_score", "ranking")
        .orderBy("ranking", "c_custkey")
    },

    "q08_proximity_mean" -> { (s, dir) =>
      // mean is summation-order-dependent across engines: round, skip rank
      new Evaluator()
        .custom("c_acctbal", 1.0, "proximity_to_mean")
        .evaluate(t(s, dir, "customer"))
        .select(col("c_custkey"), round(col("score_c_acctbal"), 4).as("score_r"))
        .orderBy("c_custkey")
    },

    "q09_log_scale" -> { (s, dir) =>
      // ln differs in last ULP across libm implementations: round, skip rank
      new Evaluator()
        .custom("p_retailprice", 1.0, "log_scale")
        .evaluate(t(s, dir, "part"))
        .select(col("p_partkey"), round(col("score_p_retailprice"), 6).as("score_r"))
        .orderBy("p_partkey")
    },

    "q10_multi_criteria" -> { (s, dir) =>
      new Evaluator()
        .minRatio("p_retailprice", 0.6)
        .linear("p_size", 0.4)
        .evaluate(t(s, dir, "part"))
        .select("p_partkey", "score_p_retailprice", "score_p_size", "final_score", "ranking")
        .orderBy("ranking", "p_partkey")
    },

    "q11_weights_raw" -> { (s, dir) =>
      new Evaluator(normalizeWeights = false)
        .linear("c_acctbal", 2.0)
        .evaluate(t(s, dir, "customer"))
        .select("c_custkey", "final_score", "ranking")
        .orderBy("ranking", "c_custkey")
    },

    "q12_summary" -> { (s, dir) =>
      new Evaluator()
        .linear("s_acctbal", 3.0)
        .minRatio("s_nationkey", 1.0)
        .summary(s)
        .orderBy("column")
    },

    // --------------------------------------- templates / config / XLSX (§2.2, E6/E7, §2.5)

    "q13_template_sweet_spot" -> { (s, dir) =>
      // §2.2 registry template through the custom-criterion path
      // (custom_templates.py:28-57): 100 inside [1000, 1500], linear
      // distance penalty outside, clipped.
      new Evaluator()
        .custom("p_retailprice", 1.0, Templates.applyTemplate("sweet_spot_range",
          Map("min_ideal" -> 1000.0, "max_ideal" -> 1500.0)))
        .evaluate(t(s, dir, "part"))
        .select("p_partkey", "score_p_retailprice", "final_score", "ranking")
        .orderBy("ranking", "p_partkey")
    },

    "q14_template_pct_best" -> { (s, dir) =>
      // stats-parameterized template (custom_templates.py:118-136): v/max
      // is bit-exact across engines (max is order-independent).
      new Evaluator()
        .custom("s_acctbal", 1.0, Templates.applyTemplate("percentage_of_best",
          Map("higher_is_better" -> true)))
        .evaluate(t(s, dir, "supplier"))
        .select("s_suppkey", "score_s_acctbal", "final_score", "ranking")
        .orderBy("ranking", "s_suppkey")
    },

    "q15_config_eval" -> { (s, dir) =>
      // E6 dispatch: criteria built from a parsed JSON config must produce
      // the exact q10 result (config == fluent is the tested invariant).
      val cfg = """{"criteria": {
        "p_retailprice": {"type": "min_ratio", "weight": 0.6},
        "p_size": {"type": "linear", "weight": 0.4}
      }}"""
      ConfigLoader.evaluatorFromConfig(
        ConfigLoader.parseJson(cfg)("criteria").asInstanceOf[Map[String, Any]])
        .evaluate(t(s, dir, "part"))
        .select("p_partkey", "score_p_retailprice", "score_p_size", "final_score", "ranking")
        .orderBy("ranking", "p_partkey")
    },

    "q17_spi_function" -> { (s, dir) =>
      // ServiceLoader-discovered scoring function (SqrtScaleProvider ships
      // in the library jar via META-INF/services) resolved by name exactly
      // like a built-in — locks the dynamic-loading analogue of the
      // reference demo's custom_functions/ directory.
      new Evaluator()
        .custom("p_retailprice", 1.0, "sqrt_scale")
        .evaluate(t(s, dir, "part"))
        .select("p_partkey", "score_p_retailprice", "final_score", "ranking")
        .orderBy("ranking", "p_partkey")
    },

    "q16_xlsx_roundtrip" -> { (s, dir) =>
      // §2.5 Excel surface: write -> read-back -> score, checked against
      // the SAME SQL oracle as a direct parquet read — the round-trip must
      // be value-lossless (shortest-repr doubles, typed re-sniffing).
      // Bounded subset: the XLSX writer is inherently driver-side.
      val sup = t(s, dir, "supplier")
        .filter(col("s_suppkey") <= 2000)
        .select("s_suppkey", "s_name", "s_acctbal")
      val path = java.nio.file.Files.createTempFile("graft_q16_", ".xlsx")
      try {
        graft.io.Xlsx.write(path.toString, Seq("supplier" -> sup))
        // read materializes driver-side into a local relation, so the temp
        // file can be deleted before the query's jobs run
        val back = graft.io.Xlsx.read(s, path.toString, Some("supplier"))
        new Evaluator()
          .linear("s_acctbal", 1.0)
          .evaluate(back)
          .select("s_suppkey", "s_acctbal", "score_s_acctbal", "final_score", "ranking")
          .orderBy("ranking", "s_suppkey")
      } finally java.nio.file.Files.deleteIfExists(path)
    },

    // ------------------------------------------------------------- staged

    "q20_staged_threshold" -> { (s, dir) =>
      val bids = t(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("total_qty"))
      new StagedEvaluator()
        .addStage("Technical", filterType = "score_threshold", threshold = 40.0)
        .linear("total_qty", 0.5)
        .linear("n_items", 0.5)
        .addStage("Economic")
        .minRatio("n_items", 1.0)
        .evaluate(bids)
        .select("l_suppkey", "n_items", "total_qty", "technical_score",
          "technical_ranking", "eliminated_at_stage", "economic_score",
          "economic_ranking", "final_score", "ranking")
        .orderBy(col("ranking").asc_nulls_last, col("l_suppkey"))
    },

    "q21_staged_topn_include" -> { (s, dir) =>
      new StagedEvaluator()
        .addStage("Screen", filterType = "top_n", topN = 100, onTie = "include")
        .direct("p_size", 1.0, inputScale = 50.0)
        .addStage("Price")
        .minRatio("p_retailprice", 1.0)
        .evaluate(t(s, dir, "part"))
        .select("p_partkey", "p_size", "screen_score", "screen_ranking",
          "eliminated_at_stage", "price_score", "price_ranking", "final_score", "ranking")
        .orderBy(col("ranking").asc_nulls_last, col("p_partkey"))
    },

    "q22_staged_topn_exclude" -> { (s, dir) =>
      // cohort bounded to 500 bids so the tie band at the cutoff cannot
      // swallow the whole rank range at larger scale factors (at sf0.1 the
      // full table has ~400 rows per p_size value: every row ties at the
      // 100th rank and 'exclude' correctly eliminates everyone — valid
      // semantics, but then stage 2 never runs and the query has no
      // price_score column to select)
      new StagedEvaluator()
        .addStage("Screen", filterType = "top_n", topN = 100, onTie = "exclude")
        .direct("p_size", 1.0, inputScale = 50.0)
        .addStage("Price")
        .minRatio("p_retailprice", 1.0)
        .evaluate(t(s, dir, "part").filter(col("p_partkey") < 500))
        .select("p_partkey", "p_size", "screen_score", "screen_ranking",
          "eliminated_at_stage", "price_score", "price_ranking", "final_score", "ranking")
        .orderBy(col("ranking").asc_nulls_last, col("p_partkey"))
    },

    "q23_staged_weighted" -> { (s, dir) =>
      new StagedEvaluator("weighted_combination")
        .addStage("Technical", filterType = "score_threshold", threshold = 30.0, weight = 0.6)
        .linear("s_acctbal", 1.0)
        .addStage("Economic", weight = 0.4)
        .formula("s_acctbal", 1.0, formula = "clip(value / 100, 0, 100)")
        .evaluate(t(s, dir, "supplier"))
        .select("s_suppkey", "technical_score", "technical_ranking",
          "eliminated_at_stage", "economic_score", "economic_ranking",
          "final_score", "ranking")
        .orderBy(col("ranking").asc_nulls_last, col("s_suppkey"))
    },

    "q24_staged_all_eliminated" -> { (s, dir) =>
      new StagedEvaluator()
        .addStage("Technical", filterType = "score_threshold", threshold = 99999.0)
        .direct("s_acctbal", 1.0)
        .addStage("Economic")
        .minRatio("s_acctbal", 1.0)
        .evaluate(t(s, dir, "supplier"))
        .select("s_suppkey", "technical_score", "technical_ranking",
          "eliminated_at_stage", "final_score", "ranking")
        .orderBy("s_suppkey")
    }
  )

  // ---------------------------------------------------------- oracle SQL

  /** DuckDB SQL mirroring each query's arithmetic op-for-op. */
  val oracleSql: Map[String, String] = Map(
    "q01_linear" ->
      """WITH s AS (SELECT min(CAST(s_acctbal AS DOUBLE)) AS mn, max(CAST(s_acctbal AS DOUBLE)) AS mx FROM supplier),
        |b AS (SELECT s_suppkey, s_acctbal,
        |  (CASE WHEN mx = mn THEN 100.0 ELSE (CAST(s_acctbal AS DOUBLE) - mn) / (mx - mn) * 100.0 END) * 1.0 AS score_s_acctbal
        |  FROM supplier, s),
        |f AS (SELECT *, score_s_acctbal / 1.0 AS final_score FROM b)
        |SELECT s_suppkey, s_acctbal, score_s_acctbal, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, s_suppkey""".stripMargin,

    "q02_linear_inverted" ->
      """WITH s AS (SELECT min(CAST(c_acctbal AS DOUBLE)) AS mn, max(CAST(c_acctbal AS DOUBLE)) AS mx FROM customer),
        |b AS (SELECT c_custkey,
        |  (CASE WHEN (-mn) = (-mx) THEN 100.0 ELSE ((-CAST(c_acctbal AS DOUBLE)) - (-mx)) / ((-mn) - (-mx)) * 100.0 END) * 0.5 AS score_c_acctbal
        |  FROM customer, s),
        |f AS (SELECT *, score_c_acctbal / 0.5 AS final_score FROM b)
        |SELECT c_custkey, score_c_acctbal, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, c_custkey""".stripMargin,

    "q03_threshold_bands" ->
      """WITH b AS (SELECT p_partkey, p_size,
        |  (CASE
        |     WHEN CAST(p_size AS DOUBLE) >= 40.0 AND CAST(p_size AS DOUBLE) < 100.0 THEN 100.0
        |     WHEN CAST(p_size AS DOUBLE) >= 25.0 AND CAST(p_size AS DOUBLE) < 40.0 THEN 80.0
        |     WHEN CAST(p_size AS DOUBLE) >= 10.0 AND CAST(p_size AS DOUBLE) < 25.0 THEN 60.0
        |     WHEN CAST(p_size AS DOUBLE) >= 1.0 AND CAST(p_size AS DOUBLE) < 10.0 THEN 40.0
        |     ELSE 0.0 END) * 2.0 AS score_p_size
        |  FROM part),
        |f AS (SELECT *, score_p_size / 2.0 AS final_score FROM b)
        |SELECT p_partkey, p_size, score_p_size, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, p_partkey""".stripMargin,

    "q04_direct_scaled" ->
      """WITH b AS (SELECT c_custkey,
        |  (CAST(c_acctbal AS DOUBLE) * (100.0 / 10000.0)) * 1.0 AS score_c_acctbal
        |  FROM customer),
        |f AS (SELECT *, score_c_acctbal / 1.0 AS final_score FROM b)
        |SELECT c_custkey, score_c_acctbal, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, c_custkey""".stripMargin,

    "q05_min_ratio" ->
      """WITH s AS (SELECT min(CAST(p_retailprice AS DOUBLE)) AS mn FROM part),
        |b AS (SELECT p_partkey,
        |  (mn / CAST(p_retailprice AS DOUBLE)) * 100.0 * 1.0 AS score_p_retailprice
        |  FROM part, s),
        |f AS (SELECT *, score_p_retailprice / 1.0 AS final_score FROM b)
        |SELECT p_partkey, score_p_retailprice, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, p_partkey""".stripMargin,

    "q06_formula_minmax" ->
      """WITH s AS (SELECT min(CAST(o_totalprice AS DOUBLE)) AS mn, max(CAST(o_totalprice AS DOUBLE)) AS mx FROM orders),
        |raw AS (SELECT o_orderkey,
        |  (CAST(o_totalprice AS DOUBLE) - mn) / (mx - mn) * 100.0 AS r
        |  FROM orders, s),
        |b AS (SELECT o_orderkey,
        |  (CASE WHEN COALESCE(r, 0.0) < 0.0 THEN 0.0 WHEN COALESCE(r, 0.0) > 100.0 THEN 100.0 ELSE COALESCE(r, 0.0) END) * 1.0 AS score_o_totalprice
        |  FROM raw),
        |f AS (SELECT *, score_o_totalprice / 1.0 AS final_score FROM b)
        |SELECT o_orderkey, score_o_totalprice, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, o_orderkey""".stripMargin,

    "q07_formula_vars" ->
      """WITH raw AS (SELECT c_custkey,
        |  CAST(c_acctbal AS DOUBLE) / 5000.0 * 100.0 AS x
        |  FROM customer),
        |clipped AS (SELECT c_custkey,
        |  CASE WHEN x < 0.0 THEN 0.0 WHEN x > 100.0 THEN 100.0 ELSE x END AS r
        |  FROM raw),
        |b AS (SELECT c_custkey,
        |  (CASE WHEN COALESCE(r, 0.0) < 0.0 THEN 0.0 WHEN COALESCE(r, 0.0) > 100.0 THEN 100.0 ELSE COALESCE(r, 0.0) END) * 1.0 AS score_c_acctbal
        |  FROM clipped),
        |f AS (SELECT *, score_c_acctbal / 1.0 AS final_score FROM b)
        |SELECT c_custkey, score_c_acctbal, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, c_custkey""".stripMargin,

    "q08_proximity_mean" ->
      """WITH s AS (SELECT avg(CAST(c_acctbal AS DOUBLE)) AS m FROM customer),
        |b AS (SELECT c_custkey,
        |  (100.0 - abs((CAST(c_acctbal AS DOUBLE) - m) / m) * 100.0) AS raw
        |  FROM customer, s)
        |SELECT c_custkey,
        |  round((CASE WHEN raw < 0.0 THEN 0.0 ELSE raw END) * 1.0, 4) AS score_r
        |FROM b ORDER BY c_custkey""".stripMargin,

    "q09_log_scale" ->
      """WITH s AS (SELECT ln(max(CAST(p_retailprice AS DOUBLE)) + 1.0) AS lmx FROM part)
        |SELECT p_partkey,
        |  round((ln(CAST(p_retailprice AS DOUBLE) + 1.0) / lmx * 100.0) * 1.0, 6) AS score_r
        |FROM part, s ORDER BY p_partkey""".stripMargin,

    "q13_template_sweet_spot" ->
      """WITH b0 AS (SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS v FROM part),
        |raw AS (SELECT p_partkey,
        |  CASE WHEN v > 1500.0 THEN 100.0 - (v - 1500.0) / 1500.0 * 100.0
        |       WHEN v < 1000.0 THEN 100.0 - (1000.0 - v) / 1000.0 * 100.0
        |       ELSE 100.0 END AS r
        |  FROM b0),
        |b AS (SELECT p_partkey,
        |  (CASE WHEN r < 0.0 THEN 0.0 WHEN r > 100.0 THEN 100.0 ELSE r END) * 1.0 AS score_p_retailprice
        |  FROM raw),
        |f AS (SELECT *, score_p_retailprice / 1.0 AS final_score FROM b)
        |SELECT p_partkey, score_p_retailprice, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, p_partkey""".stripMargin,

    "q14_template_pct_best" ->
      """WITH s AS (SELECT max(CAST(s_acctbal AS DOUBLE)) AS mx FROM supplier),
        |raw AS (SELECT s_suppkey, CAST(s_acctbal AS DOUBLE) / mx * 100.0 AS r FROM supplier, s),
        |b AS (SELECT s_suppkey,
        |  (CASE WHEN r < 0.0 THEN 0.0 WHEN r > 100.0 THEN 100.0 ELSE r END) * 1.0 AS score_s_acctbal
        |  FROM raw),
        |f AS (SELECT *, score_s_acctbal / 1.0 AS final_score FROM b)
        |SELECT s_suppkey, score_s_acctbal, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, s_suppkey""".stripMargin,

    // q15 is the config-built twin of q10: identical oracle arithmetic
    "q15_config_eval" ->
      """WITH s AS (SELECT min(CAST(p_retailprice AS DOUBLE)) AS mn_p,
        |  min(CAST(p_size AS DOUBLE)) AS mn_s, max(CAST(p_size AS DOUBLE)) AS mx_s FROM part),
        |b AS (SELECT p_partkey,
        |  (mn_p / CAST(p_retailprice AS DOUBLE)) * 100.0 * 0.6 AS score_p_retailprice,
        |  (CASE WHEN mx_s = mn_s THEN 100.0 ELSE (CAST(p_size AS DOUBLE) - mn_s) / (mx_s - mn_s) * 100.0 END) * 0.4 AS score_p_size
        |  FROM part, s),
        |f AS (SELECT *, (score_p_retailprice + score_p_size) / 1.0 AS final_score FROM b)
        |SELECT p_partkey, score_p_retailprice, score_p_size, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, p_partkey""".stripMargin,

    // IEEE sqrt is correctly rounded -> bit-exact across engines
    "q17_spi_function" ->
      """WITH s AS (SELECT max(CAST(p_retailprice AS DOUBLE)) AS mx FROM part),
        |b AS (SELECT p_partkey,
        |  sqrt(CAST(p_retailprice AS DOUBLE) / mx) * 100.0 * 1.0 AS score_p_retailprice
        |  FROM part, s),
        |f AS (SELECT *, score_p_retailprice / 1.0 AS final_score FROM b)
        |SELECT p_partkey, score_p_retailprice, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, p_partkey""".stripMargin,

    // q16 reads what the engine wrote to XLSX; the oracle reads the source
    // parquet directly — a hash match proves the round-trip lossless
    "q16_xlsx_roundtrip" ->
      """WITH sub AS (SELECT s_suppkey, s_acctbal FROM supplier WHERE s_suppkey <= 2000),
        |s AS (SELECT min(CAST(s_acctbal AS DOUBLE)) AS mn, max(CAST(s_acctbal AS DOUBLE)) AS mx FROM sub),
        |b AS (SELECT s_suppkey, s_acctbal,
        |  (CASE WHEN mx = mn THEN 100.0 ELSE (CAST(s_acctbal AS DOUBLE) - mn) / (mx - mn) * 100.0 END) * 1.0 AS score_s_acctbal
        |  FROM sub, s),
        |f AS (SELECT *, score_s_acctbal / 1.0 AS final_score FROM b)
        |SELECT s_suppkey, s_acctbal, score_s_acctbal, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, s_suppkey""".stripMargin,

    "q10_multi_criteria" ->
      """WITH s AS (SELECT min(CAST(p_retailprice AS DOUBLE)) AS mn_p,
        |  min(CAST(p_size AS DOUBLE)) AS mn_s, max(CAST(p_size AS DOUBLE)) AS mx_s FROM part),
        |b AS (SELECT p_partkey,
        |  (mn_p / CAST(p_retailprice AS DOUBLE)) * 100.0 * 0.6 AS score_p_retailprice,
        |  (CASE WHEN mx_s = mn_s THEN 100.0 ELSE (CAST(p_size AS DOUBLE) - mn_s) / (mx_s - mn_s) * 100.0 END) * 0.4 AS score_p_size
        |  FROM part, s),
        |f AS (SELECT *, (score_p_retailprice + score_p_size) / 1.0 AS final_score FROM b)
        |SELECT p_partkey, score_p_retailprice, score_p_size, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, p_partkey""".stripMargin,

    "q11_weights_raw" ->
      """WITH s AS (SELECT min(CAST(c_acctbal AS DOUBLE)) AS mn, max(CAST(c_acctbal AS DOUBLE)) AS mx FROM customer),
        |f AS (SELECT c_custkey,
        |  (CASE WHEN mx = mn THEN 100.0 ELSE (CAST(c_acctbal AS DOUBLE) - mn) / (mx - mn) * 100.0 END) * 2.0 AS final_score
        |  FROM customer, s)
        |SELECT c_custkey, final_score,
        |  RANK() OVER (ORDER BY final_score DESC) AS ranking
        |FROM f ORDER BY ranking, c_custkey""".stripMargin,

    "q12_summary" ->
      """SELECT * FROM (VALUES
        |  ('s_acctbal', 's_acctbal', 'LinearCriterion', 3.0, 0.75),
        |  ('s_nationkey', 's_nationkey', 'MinimumRatioCriterion', 1.0, 0.25)
        |) AS t("column", criterion_name, "type", weight, normalized_weight)
        |ORDER BY "column"""".stripMargin,

    "q20_staged_threshold" ->
      """WITH bids AS (
        |  SELECT l_suppkey, COUNT(*) AS n_items, SUM(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_suppkey
        |), s1 AS (
        |  SELECT min(CAST(total_qty AS DOUBLE)) AS mn_tq, max(CAST(total_qty AS DOUBLE)) AS mx_tq,
        |         min(CAST(n_items AS DOUBLE)) AS mn_ni, max(CAST(n_items AS DOUBLE)) AS mx_ni
        |  FROM bids
        |), t AS (
        |  SELECT bids.*,
        |    ((CASE WHEN mx_tq = mn_tq THEN 100.0 ELSE (CAST(total_qty AS DOUBLE) - mn_tq) / (mx_tq - mn_tq) * 100.0 END) * 0.5
        |     + (CASE WHEN mx_ni = mn_ni THEN 100.0 ELSE (CAST(n_items AS DOUBLE) - mn_ni) / (mx_ni - mn_ni) * 100.0 END) * 0.5) / 1.0 AS technical_score
        |  FROM bids, s1
        |), tr AS (
        |  SELECT t.*, RANK() OVER (ORDER BY technical_score DESC) AS technical_ranking,
        |    CASE WHEN technical_score < 40.0 THEN 'Technical' END AS eliminated_at_stage
        |  FROM t
        |), s2 AS (
        |  SELECT min(CAST(n_items AS DOUBLE)) AS mn2 FROM tr WHERE eliminated_at_stage IS NULL
        |), e AS (
        |  SELECT tr.*,
        |    CASE WHEN eliminated_at_stage IS NULL
        |      THEN ((mn2 / CAST(n_items AS DOUBLE)) * 100.0 * 1.0) / 1.0 END AS economic_score
        |  FROM tr, s2
        |), sr AS (
        |  SELECT l_suppkey, RANK() OVER (ORDER BY economic_score DESC) AS economic_ranking
        |  FROM e WHERE eliminated_at_stage IS NULL
        |)
        |SELECT e.l_suppkey, n_items, total_qty, technical_score, technical_ranking,
        |  eliminated_at_stage, economic_score, sr.economic_ranking,
        |  economic_score AS final_score, sr.economic_ranking AS ranking
        |FROM e LEFT JOIN sr ON e.l_suppkey = sr.l_suppkey
        |ORDER BY ranking ASC NULLS LAST, e.l_suppkey""".stripMargin,

    "q21_staged_topn_include" ->
      """WITH t AS (
        |  SELECT p_partkey, p_size, p_retailprice,
        |    ((CAST(p_size AS DOUBLE) * (100.0 / 50.0)) * 1.0) / 1.0 AS screen_score
        |  FROM part
        |), tr AS (
        |  SELECT t.*, RANK() OVER (ORDER BY screen_score DESC) AS screen_ranking FROM t
        |), marked AS (
        |  SELECT tr.*, CASE WHEN NOT (screen_ranking <= 100) THEN 'Screen' END AS eliminated_at_stage
        |  FROM tr
        |), s2 AS (
        |  SELECT min(CAST(p_retailprice AS DOUBLE)) AS mn2 FROM marked WHERE eliminated_at_stage IS NULL
        |), e AS (
        |  SELECT marked.*, CASE WHEN eliminated_at_stage IS NULL
        |    THEN ((mn2 / CAST(p_retailprice AS DOUBLE)) * 100.0 * 1.0) / 1.0 END AS price_score
        |  FROM marked, s2
        |), sr AS (
        |  SELECT p_partkey, RANK() OVER (ORDER BY price_score DESC) AS price_ranking
        |  FROM e WHERE eliminated_at_stage IS NULL
        |)
        |SELECT e.p_partkey, p_size, screen_score, screen_ranking, eliminated_at_stage,
        |  price_score, sr.price_ranking, price_score AS final_score, sr.price_ranking AS ranking
        |FROM e LEFT JOIN sr ON e.p_partkey = sr.p_partkey
        |ORDER BY ranking ASC NULLS LAST, e.p_partkey""".stripMargin,

    "q22_staged_topn_exclude" ->
      """WITH t AS (
        |  SELECT p_partkey, p_size, p_retailprice,
        |    ((CAST(p_size AS DOUBLE) * (100.0 / 50.0)) * 1.0) / 1.0 AS screen_score
        |  FROM part WHERE p_partkey < 500
        |), tr AS (
        |  SELECT t.*, RANK() OVER (ORDER BY screen_score DESC) AS screen_ranking FROM t
        |), cut AS (
        |  SELECT CASE WHEN (SELECT COUNT(*) FROM tr) <= 100 THEN NULL ELSE
        |    (SELECT screen_score FROM tr ORDER BY screen_score DESC LIMIT 1 OFFSET 99) END AS cutoff
        |), cnt AS (
        |  SELECT COUNT(*) AS at_or_above FROM tr, cut WHERE screen_score >= cutoff
        |), marked AS (
        |  SELECT tr.*, CASE
        |    WHEN (SELECT cutoff FROM cut) IS NULL THEN NULL
        |    WHEN (SELECT at_or_above FROM cnt) > 100 AND NOT (screen_score > (SELECT cutoff FROM cut)) THEN 'Screen'
        |    WHEN (SELECT at_or_above FROM cnt) <= 100 AND NOT (screen_score >= (SELECT cutoff FROM cut)) THEN 'Screen'
        |    END AS eliminated_at_stage
        |  FROM tr
        |), s2 AS (
        |  SELECT min(CAST(p_retailprice AS DOUBLE)) AS mn2 FROM marked WHERE eliminated_at_stage IS NULL
        |), e AS (
        |  SELECT marked.*, CASE WHEN eliminated_at_stage IS NULL
        |    THEN ((mn2 / CAST(p_retailprice AS DOUBLE)) * 100.0 * 1.0) / 1.0 END AS price_score
        |  FROM marked, s2
        |), sr AS (
        |  SELECT p_partkey, RANK() OVER (ORDER BY price_score DESC) AS price_ranking
        |  FROM e WHERE eliminated_at_stage IS NULL
        |)
        |SELECT e.p_partkey, p_size, screen_score, screen_ranking, eliminated_at_stage,
        |  price_score, sr.price_ranking, price_score AS final_score, sr.price_ranking AS ranking
        |FROM e LEFT JOIN sr ON e.p_partkey = sr.p_partkey
        |ORDER BY ranking ASC NULLS LAST, e.p_partkey""".stripMargin,

    "q23_staged_weighted" ->
      """WITH s1 AS (SELECT min(CAST(s_acctbal AS DOUBLE)) AS mn, max(CAST(s_acctbal AS DOUBLE)) AS mx FROM supplier),
        |t AS (
        |  SELECT s_suppkey, s_acctbal,
        |    ((CASE WHEN mx = mn THEN 100.0 ELSE (CAST(s_acctbal AS DOUBLE) - mn) / (mx - mn) * 100.0 END) * 1.0) / 1.0 AS technical_score
        |  FROM supplier, s1
        |), tr AS (
        |  SELECT t.*, RANK() OVER (ORDER BY technical_score DESC) AS technical_ranking,
        |    CASE WHEN technical_score < 30.0 THEN 'Technical' END AS eliminated_at_stage
        |  FROM t
        |), raw AS (
        |  SELECT tr.*, CAST(s_acctbal AS DOUBLE) / 100.0 AS x FROM tr
        |), c1 AS (
        |  SELECT raw.*, CASE WHEN x < 0.0 THEN 0.0 WHEN x > 100.0 THEN 100.0 ELSE x END AS clip1 FROM raw
        |), c2 AS (
        |  SELECT c1.*, CASE WHEN COALESCE(clip1, 0.0) < 0.0 THEN 0.0 WHEN COALESCE(clip1, 0.0) > 100.0 THEN 100.0 ELSE COALESCE(clip1, 0.0) END AS r2 FROM c1
        |), e AS (
        |  SELECT c2.*, CASE WHEN eliminated_at_stage IS NULL THEN ((r2 * 1.0) / 1.0) END AS economic_score FROM c2
        |), er AS (
        |  SELECT s_suppkey, RANK() OVER (ORDER BY economic_score DESC) AS economic_ranking
        |  FROM e WHERE eliminated_at_stage IS NULL
        |), f AS (
        |  SELECT e.*, er.economic_ranking,
        |    0.0 + COALESCE(technical_score, 0.0) * 0.6 + COALESCE(economic_score, 0.0) * 0.4 AS final_score
        |  FROM e LEFT JOIN er ON e.s_suppkey = er.s_suppkey
        |), fr AS (
        |  SELECT s_suppkey, RANK() OVER (ORDER BY final_score DESC) AS ranking
        |  FROM f WHERE eliminated_at_stage IS NULL
        |)
        |SELECT f.s_suppkey, technical_score, technical_ranking, eliminated_at_stage,
        |  economic_score, economic_ranking, final_score, fr.ranking
        |FROM f LEFT JOIN fr ON f.s_suppkey = fr.s_suppkey
        |ORDER BY ranking ASC NULLS LAST, f.s_suppkey""".stripMargin,

    "q24_staged_all_eliminated" ->
      """WITH t AS (
        |  SELECT s_suppkey, ((CAST(s_acctbal AS DOUBLE) * 1.0) / 1.0) AS technical_score
        |  FROM supplier
        |)
        |SELECT s_suppkey, technical_score,
        |  RANK() OVER (ORDER BY technical_score DESC) AS technical_ranking,
        |  'Technical' AS eliminated_at_stage,
        |  CAST(NULL AS DOUBLE) AS final_score,
        |  CAST(NULL AS BIGINT) AS ranking
        |FROM t ORDER BY s_suppkey""".stripMargin
  )
}
