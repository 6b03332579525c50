package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-set assembly.
  *
  * Everything keys off the cross-engine polynomial hash of the row's OWN
  * identity ([[TextHash.polyHash]]) — never an RNG and never a partition
  * index — so a sample is (a) bit-identical at any parallelism / cluster
  * size, (b) stable under re-runs and resumes, and (c) verifiable in any
  * ANSI SQL engine (the DuckDB oracle reproduces the exact row set).
  */
object Sampling {

  /** THE keep-decision — the single quantization code path every sampling
    * operator routes through (rate quantized to 1/1000ths, HALF_UP):
    * hash(identity:salt) mod 1000 < round(rate·1000).
    */
  private def keepCol(identity: Column, rate: Column, salt: String): Column =
    pmod(TextHash.polyHash(concat(identity.cast("string"), lit(":" + salt))),
      lit(1000L)) < round(rate * 1000.0)

  /** Uniform deterministic keep-decision at `rate` for the given identity
    * expression; `salt` decorrelates independent samples of the same table.
    */
  def keepAtRate(identity: Column, rate: Double, salt: String): Column =
    keepCol(identity, lit(rate), salt)

  /** Stratified sample: per-stratum keep rates (e.g. language-balanced data
    * mixing). Strata missing from `rates` fall back to `defaultRate`.
    * One narrow scan, no shuffle — the filter composes with pushdown.
    * Same quantization as [[keepAtRate]] by construction (shared keepCol).
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: String = "s1"
  ): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, r)) => when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.where(keepCol(col(idCol), rate, salt))
  }

  /** Per-stratum keep rates realizing a target TOKEN mixture — the
    * production data-mixing shape (domain weights are specified over
    * tokens, not document counts): rate_d = min(1, budget·w_d / tokens_d).
    * One aggregation pass; the strata map is domain-sized (languages,
    * sources), so it collects to the driver by design. A stratum whose
    * corpus is smaller than its token allocation saturates at rate 1
    * (upsampling/epochs are the caller's policy, not a sampler's).
    *
    * The rate arithmetic runs the exact op sequence `(budget·w) / tokens`
    * on exact integer token sums, so any SQL engine reproduces the rates —
    * and therefore the kept row set — bit-for-bit.
    */
  def ratesForTokenBudget(
      df: DataFrame,
      strataCol: String,
      tokensCol: String,
      weights: Map[String, Double],
      budget: Long
  ): Map[String, Double] = {
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(tokensCol).cast("long")).as("t"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("t")).toMap
    weights.map { case (k, w) =>
      val t = totals.getOrElse(k, 0L)
      k -> (if (t <= 0L) 0.0 else math.min(1.0, budget * w / t.toDouble))
    }
  }

  /** Token-budget data mixing: keep a deterministic sample whose expected
    * per-stratum token mass matches `weights` under `budget` total tokens.
    * Strata not in `weights` are dropped (weight 0) — a mixture definition
    * is exhaustive by nature.
    */
  def mixByTokenBudget(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      tokensCol: String,
      weights: Map[String, Double],
      budget: Long,
      salt: String = "mix1"
  ): DataFrame =
    stratified(df, idCol, strataCol,
      ratesForTokenBudget(df, strataCol, tokensCol, weights, budget),
      defaultRate = 0.0, salt = salt)

  /** Deterministic train/val/test (or any named-fraction) split assignment:
    * the identity hash band (1/1000ths, same quantization as [[keepAtRate]])
    * walks the cumulative fraction thresholds in the given order. Pure
    * per-row expression — no shuffle, stable under re-runs/resharding, and
    * a row can never land in two splits (the failure mode of per-split
    * independent sampling). Rounding drift in the last band falls into the
    * final split.
    */
  def assignSplit(
      identity: Column,
      fractions: Seq[(String, Double)],
      salt: String = "split1"
  ): Column = {
    require(fractions.nonEmpty &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got $fractions")
    val band = pmod(
      TextHash.polyHash(concat(identity.cast("string"), lit(":" + salt))),
      lit(1000L))
    val cums = fractions.scanLeft(0L) {
      case (acc, (_, f)) => acc + math.round(f * 1000.0)
    }.tail
    fractions.init.map(_._1).zip(cums.init)
      .foldLeft(None: Option[Column]) { case (acc, (name, cum)) =>
        Some(acc.fold(when(band < cum, name))(_.when(band < cum, name)))
      }
      .fold(lit(fractions.head._1))(_.otherwise(fractions.last._1))
  }
}
