package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `PropertyStats.calc_stat` string dispatch
  * (featurebox/featurizers/extrastats.py:39-54): `"holder_mean::2"` →
  * method + args. Here: stat spec string → weighted aggregate Column
  * builder. Every stat composes from native power sums (codegen'd,
  * map-side combinable); none needs a UDAF.
  */
object StatRegistry {

  /** Resolve a stat spec like "mean", "std_dev", "holder_mean::2",
    * "quantile::0.5" to an aggregate-Column builder over (x, w).
    */
  def apply(spec: String): (Column, Column) => Column = {
    val parts = spec.split("::")
    val name = parts.head
    val args = parts.drop(1).map(_.toDouble)
    name match {
      case "minimum"      => (x, _) => WeightedStats.minNaN(x)
      case "maximum"      => (x, _) => WeightedStats.maxNaN(x)
      case "range"        => (x, _) => WeightedStats.rangeNaN(x)
      case "mean"         => WeightedStats.mean
      case "inverse_mean" => WeightedStats.inverseMean
      case "geom_mean"    => WeightedStats.geometricMean
      case "harm_mean"    => WeightedStats.harmonicMean
      case "variance"     => WeightedStats.variancePop
      case "std_dev"      => WeightedStats.stdDevWeighted
      case "skewness"     => WeightedStats.skewness
      case "kurtosis"     => WeightedStats.kurtosisPearson
      case "geom_std_dev" => WeightedStats.geomStdDev
      case "holder_mean"  => (x, w) => WeightedStats.holderMean(x, w, args.headOption.getOrElse(1.0))
      case "quantile"     => (x, _) => WeightedStats.quantile(x, args.headOption.getOrElse(0.5))
      case "wquantile"    => (x, w) => WeightedStats.weightedQuantile(x, w, args.headOption.getOrElse(0.5))
      case "sorted"       => (x, _) => sort_array(collect_list(x)) // extrastats.py:299-305
      case "flatten"      => (x, _) => flatten(collect_list(x)) // ravel of array-valued x
      case "avg_dev" =>
        // weighted mean absolute deviation needs the mean first — two-phase;
        // exposed via DataFrame helper below
        throw new IllegalArgumentException("avg_dev: use StatRegistry.avgDev (two-phase)")
      case other => throw new IllegalArgumentException(s"unknown stat: $other")
    }
  }

  val singlePass: Seq[String] = Seq(
    "minimum", "maximum", "range", "mean", "inverse_mean", "geom_mean",
    "harm_mean", "variance", "std_dev", "skewness", "kurtosis",
    "geom_std_dev", "holder_mean::2", "quantile::0.5", "wquantile::0.5")

  /** Eigenvalues of a small symmetric matrix (extrastats.py:307-321) —
    * driver-side breeze on a collected matrix (the reference's use case is
    * d×d statistics matrices, never data-sized).
    */
  def eigenvalues(m: Array[Array[Double]]): Array[Double] = {
    val dm = breeze.linalg.DenseMatrix.tabulate(m.length, m.length)((i, j) => m(i)(j))
    breeze.linalg.eigSym(dm).eigenvalues.toArray.sorted
  }

  /** DataFrame-level route for `wquantile` stat specs over groups of ANY
    * size (round-5 verdict task #8): dispatches to the WINDOW-path exact
    * weighted quantile ([[WeightedStats.weightedQuantilesGrouped]] —
    * running cumsum, O(1) state per row), which is spec-pinned
    * value-identical to the buffered `wquantile` aggregate the column
    * dispatch returns but has no group-size ceiling. Composed
    * ExtraMix-style stat lists should take this route whenever a group
    * may not fit an executor; specs are the same `"wquantile::q"`
    * strings, output columns are named `wquantile_<q>`.
    */
  def wquantileGrouped(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      x: Column,
      w: Column,
      specs: Seq[String]
  ): org.apache.spark.sql.DataFrame = {
    val qs = specs.map { sp =>
      val parts = sp.split("::")
      require(parts.length == 2 && parts.head == "wquantile",
        s"wquantileGrouped takes 'wquantile::q' specs, got '$sp'")
      (s"wquantile_${parts(1)}", parts(1).toDouble)
    }
    WeightedStats.weightedQuantilesGrouped(df, keys, x, w, qs)
  }

  /** Weighted mean absolute deviation about the weighted mean
    * (extrastats.py:115-128). Two passes expressed as one self-join-free
    * plan: compute the group mean with a window, then aggregate |x−μ|.
    */
  def avgDev(
      df: org.apache.spark.sql.DataFrame,
      keys: Seq[String],
      x: String,
      w: String
  ): org.apache.spark.sql.DataFrame = {
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val mu = sum(col(w) * col(x)).over(byKey) / sum(col(w)).over(byKey)
    df.withColumn("__mu", mu)
      .groupBy(keys.map(col): _*)
      .agg((sum(col(w) * abs(col(x) - col("__mu"))) / sum(col(w)))
        .as(s"${x}_avg_dev"))
  }
}
