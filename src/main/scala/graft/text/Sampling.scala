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
}
