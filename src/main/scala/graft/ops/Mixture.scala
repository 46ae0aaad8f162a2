package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loss-driven DOMAIN-MIXTURE optimization — the step between "we can
  * mix sources at fixed proportions" ([[Sampling.temperatureMix]],
  * [[Sampling.quotaSample]]) and "the proportions themselves come from
  * measurement": given a reference model's and a proxy model's held-out
  * loss per domain, upweight the domains where the proxy still has the
  * most to learn (the DoReMi signal, Xie et al. 2023 — excess loss =
  * max(proxy − ref, 0)) and resample the corpus to the optimized
  * mixture.
  *
  * The update is the LINEARIZED multiplicative-weights round,
  * `raw_d = 1 + η·excess_d`, not the exponential one: ×, +, ÷ are
  * IEEE-exact and replay bit-identically in any engine, while `exp`
  * never enters the engine's deterministic vocabulary (the
  * [[Classifier.trainPortable]] rational-sigmoid precedent; for the
  * small η regime where MW is run the two updates agree to first
  * order). Weights normalize over a sorted-domain fold and then smooth
  * toward uniform: `w_d = (1−c)·raw_d/Σ + c/K` — DoReMi's uniform
  * mixing that keeps every domain sampled.
  *
  * Scale shape: losses live at DOMAIN grain (dozens–thousands of rows)
  * and fold on the driver under the [[Sampling.MixMaxSources]] loud
  * ceiling — the [[Sampling.temperatureMix]] contract; the corpus-side
  * resample is one broadcast acceptance table and a map-side filter,
  * no shuffle of the corpus. */
object Mixture {

  /** Optimized mixture weights from per-domain (reference, proxy)
    * losses: one row per domain in, `(domain, excess_r, weight_r)` out
    * (domain string-cast, 6dp rounding applied IN Spark so the rounding
    * semantics match every other `_r` column). Weights sum to 1 before
    * rounding. A duplicated domain or a null loss refuses loudly — a
    * silent last-wins (or a silently-dropped domain) would change every
    * other domain's weight.
    *
    * `iters` runs the multiplicative-weights update as DoReMi's
    * published LOOP rather than a single step (the q258/q264
    * bounded-replay discipline): each round multiplies the standing
    * weight by the linearized factor `1 + η·excess_d`, renormalizes
    * over the sorted-domain fold, and mixes toward uniform
    * (`(1−c)·w + c/K` — DoReMi applies the uniform mixing every step,
    * not once at the end). More rounds sharpen the allocation toward
    * the high-excess domains — a 1-round fit systematically
    * over-weights the low-excess tail relative to where the MW
    * iteration is headed (spec-pinned). `iters = 1` is bit-identical
    * to the historical single-step output. Everything stays ×, +, ÷
    * on driver-held domain-grain scalars; `exp` never enters. */
  def domainReweight(
      losses: DataFrame,
      domainCol: String,
      refLossCol: String,
      proxyLossCol: String,
      eta: Double = 1.0,
      smoothing: Double = 0.0,
      iters: Int = 1
  ): DataFrame = {
    require(eta > 0.0, "eta must be positive")
    require(smoothing >= 0.0 && smoothing < 1.0, "smoothing must be in [0, 1)")
    require(iters >= 1, "iters must be >= 1")
    val spark = losses.sparkSession
    val rows = losses
      .select(col(domainCol).cast("string").as("__d"),
        col(refLossCol).cast("double").as("__ref"),
        col(proxyLossCol).cast("double").as("__proxy"))
      .limit(Sampling.MixMaxSources + 1)
      .collect()
    require(rows.length <= Sampling.MixMaxSources,
      s"domainReweight saw > ${Sampling.MixMaxSources} domains — this is " +
        "a per-domain mixing op at source/domain grain, not a per-key " +
        "one; aggregate losses to coarser domains first")
    require(rows.nonEmpty, "domainReweight: losses frame is empty")
    val parsed = rows.toSeq.map { r =>
      val d = Option(r.getString(0))
      require(!r.isNullAt(1) && !r.isNullAt(2),
        s"domainReweight: domain '${d.orNull}' has a null reference/proxy " +
          "loss — measure or drop the domain upstream")
      (d, r.getDouble(1), r.getDouble(2))
    }.sortBy(_._1)
    parsed.groupBy(_._1).foreach { case (d, g) =>
      require(g.length == 1,
        s"domainReweight: domain '${d.orNull}' appears more than once — " +
          "one loss row per domain (a silent last-wins would move every " +
          "other domain's weight)")
    }
    val k = parsed.length
    val excesses = parsed.map { case (d, ref, proxy) =>
      (d, math.max(proxy - ref, 0.0))
    }
    // MW loop on driver-held domain scalars, weights starting at 1.0
    // (scale washes out in the first renormalization, and round 1 then
    // reproduces the historical single-step doubles exactly). Per round:
    // multiply, renormalize over the sorted-domain fold (the oracle
    // mirrors this exact summation order), mix toward uniform.
    var w = excesses.map { case (d, excess) => (d, excess, 1.0) }
    for (_ <- 1 to iters) {
      val raw = w.map { case (d, excess, wd) =>
        (d, excess, wd * (1.0 + eta * excess))
      }
      val z = raw.foldLeft(0.0)(_ + _._3)
      w = raw.map { case (d, excess, r) =>
        (d, excess, (1.0 - smoothing) * (r / z) + smoothing / k)
      }
    }
    val schema = StructType(Seq(
      StructField("domain", StringType, nullable = true),
      StructField("__excess", DoubleType, nullable = false),
      StructField("__weight", DoubleType, nullable = false)))
    val out = w.map { case (d, excess, wd) => Row(d.orNull, excess, wd) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(out, 1), schema)
      .select(col("domain"),
        (round(col("__excess"), 6) + lit(0.0)).as("excess_r"),
        (round(col("__weight"), 6) + lit(0.0)).as("weight_r"))
  }

  /** Resample `df` so each domain contributes in proportion to its
    * weight from a [[domainReweight]] frame: keep a row iff
    * `unitHash(id, salt) < min(1, targetRows · w_d / n_d)` — the
    * [[Sampling.temperatureMix]] acceptance contract, deterministic and
    * engine-reproducible. Domains present in the corpus but absent from
    * the weights frame drop entirely (weight 0 — refusing instead would
    * make routine "weights trained on last week's domain list" runs
    * impossible; the drop is the documented semantics). A domain listed
    * twice in the weights refuses loudly.
    *
    * `df` is evaluated twice (the per-domain counts, then the filter —
    * the [[Sampling.temperatureMix]] shape): pass a deterministic frame
    * (a table, not a fresh `sample`/`limit`), or persist it first, so
    * the acceptance cuts are computed against the same rows they
    * filter. */
  def resampleToMixture(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: DataFrame,
      targetRows: Long,
      domainCol: String = "domain",
      weightCol: String = "weight_r",
      salt: String = ""
  ): DataFrame = {
    require(targetRows > 0, "targetRows must be positive")
    val wRows = weights
      .select(col(domainCol).cast("string").as("__d"),
        col(weightCol).cast("double").as("__w"))
      .limit(Sampling.MixMaxSources + 1)
      .collect()
    require(wRows.length <= Sampling.MixMaxSources,
      s"resampleToMixture saw > ${Sampling.MixMaxSources} weight rows — " +
        "aggregate to coarser domains first")
    val w = wRows.toSeq
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    w.groupBy(_._1).foreach { case (d, g) =>
      require(g.length == 1,
        s"resampleToMixture: domain '${d.orNull}' has more than one " +
          "weight row — dedupe the weights frame upstream")
    }
    val counts = df
      .groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(count(lit(1)).as("n"))
      .limit(Sampling.MixMaxSources + 1)
      .collect()
    require(counts.length <= Sampling.MixMaxSources,
      s"resampleToMixture saw > ${Sampling.MixMaxSources} distinct " +
        s"domains in '$sourceCol' — cap domains with quotaSample first")
    val nBySrc = counts.map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    // op order is part of the contract: target * w / n, then the 1.0 cap
    val accept = w.flatMap { case (d, wt) =>
      nBySrc.get(d).map(n =>
        (d, math.min(1.0, targetRows.toDouble * wt / n.toDouble)))
    }.sortBy(_._1)
    val u = Sampling.unitHash(col(idCol), salt)
    Sampling.applyAcceptance(df, sourceCol, u, accept,
      useJoin = accept.length > Sampling.TemperatureMixCaseBound)
  }

  /** [[resampleToMixture]] against a TOKEN budget — mixing recipes
    * budget tokens, not rows (the [[Sampling.tokenBudgetMix]] rationale
    * applied to optimized weights): per domain, acceptance =
    * `min(1, targetTokens · w_d / tokens_d)` where `tokens_d` is the
    * domain's EXACT integer token total over `tokenCol`, so the kept
    * rows carry ≈ `targetTokens · w_d` tokens in expectation. Same
    * determinism, drop-missing-domain, and two-evaluation contracts as
    * [[resampleToMixture]]; rows with a null token count refuse loudly
    * (a silent zero would inflate the domain's acceptance). */
  def resampleToMixtureTokens(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: DataFrame,
      targetTokens: Long,
      tokenCol: String,
      domainCol: String = "domain",
      weightCol: String = "weight_r",
      salt: String = ""
  ): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    val wRows = weights
      .select(col(domainCol).cast("string").as("__d"),
        col(weightCol).cast("double").as("__w"))
      .limit(Sampling.MixMaxSources + 1)
      .collect()
    require(wRows.length <= Sampling.MixMaxSources,
      s"resampleToMixtureTokens saw > ${Sampling.MixMaxSources} weight " +
        "rows — aggregate to coarser domains first")
    val w = wRows.toSeq
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) 0.0 else r.getDouble(1)))
    w.groupBy(_._1).foreach { case (d, g) =>
      require(g.length == 1,
        s"resampleToMixtureTokens: domain '${d.orNull}' has more than one " +
          "weight row — dedupe the weights frame upstream")
    }
    val guarded = df.withColumn("__graft_tok",
      when(col(tokenCol).isNull, raise_error(lit(
        "resampleToMixtureTokens: null token count — a silent zero would " +
          "inflate the domain's acceptance; fill or drop upstream")))
        .otherwise(col(tokenCol).cast("long")))
    val counts = guarded
      .groupBy(col(sourceCol).cast("string").as("__src"))
      .agg(sum(col("__graft_tok")).as("toks"))
      .limit(Sampling.MixMaxSources + 1)
      .collect()
    require(counts.length <= Sampling.MixMaxSources,
      s"resampleToMixtureTokens saw > ${Sampling.MixMaxSources} distinct " +
        s"domains in '$sourceCol' — cap domains with quotaSample first")
    val tokBySrc = counts.map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    // op order is part of the contract: target * w / tokens, then the cap
    val accept = w.flatMap { case (d, wt) =>
      tokBySrc.get(d).filter(_ > 0L).map(t =>
        (d, math.min(1.0, targetTokens.toDouble * wt / t.toDouble)))
    }.sortBy(_._1)
    val u = Sampling.unitHash(col(idCol), salt)
    Sampling.applyAcceptance(guarded, sourceCol, u, accept,
        useJoin = accept.length > Sampling.TemperatureMixCaseBound)
      .drop("__graft_tok")
  }
}
