package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine quality-classifier training over hashing-trick features — the
  * fastText-shaped filter of production curation pipelines (label a seed
  * set, train a linear model, score the corpus), with no external ML
  * library and no model artifact to ship: features are
  * [[TextHash.hashedBow]] (text → signed integer vector, no vocabulary),
  * training reduces to ONE sufficient-statistics aggregation + a
  * driver-side (dims+1)² ridge solve, and scoring is a pure projection.
  *
  * The split mirrors the selection engine's fold-Gram design: the cluster
  * only ever computes Σ xᵢxⱼ / Σ xᵢy (exact integer sums — hashedBow
  * values are ±counts, so every product is an exact integer and the sums
  * are order-free and ANSI-SQL-verifiable); all iteration happens on the
  * driver against the tiny Gram.
  */
object Classifier {

  /** Sufficient statistics for a linear classifier: the upper triangle of
    * the augmented Gram [X | 1 | y]ᵀ[X | 1 | y] as (i, j, s) rows, where
    * indices 0..dims-1 are the hashed-BOW features, dims is the intercept
    * column and dims+1 is the label. ONE aggregation pass, no row
    * amplification: (dims+2)(dims+3)/2 sum columns travel as one partial
    * buffer per task.
    */
  def qualityGram(
      df: DataFrame,
      textCol: String,
      label: Column,
      dims: Int
  ): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims must be in [1,64], got $dims")
    val n = dims + 2
    val pairs = for { i <- 0 until n; j <- i until n } yield (i, j)
    val v = concat(TextHash.hashedBow(col(textCol), dims),
      array(lit(1.0), label.cast("double")))
    val aggd = df.select(v.as("__v")).agg(
      pairs.map { case (i, j) =>
        sum((element_at(col("__v"), i + 1) * element_at(col("__v"), j + 1))
          .cast("long")).as(s"s_${i}_$j")
      }.head, pairs.tail.map { case (i, j) =>
        sum((element_at(col("__v"), i + 1) * element_at(col("__v"), j + 1))
          .cast("long")).as(s"s_${i}_$j")
      }: _*)
    aggd.select(explode(array(pairs.map { case (i, j) =>
      struct(lit(i).as("i"), lit(j).as("j"), col(s"s_${i}_$j").as("s"))
    }: _*)).as("u")).select(col("u.i").as("i"), col("u.j").as("j"),
      col("u.s").as("s"))
  }

  /** Ridge solve on a collected [[qualityGram]]: (G + λI)w = Xᵀy with the
    * intercept unpenalized. Returns dims feature weights + the intercept
    * as the last entry. Driver-side by design — the Gram is (dims+1)².
    */
  def trainRidge(gramRows: Seq[(Int, Int, Long)], dims: Int, lambda: Double): Array[Double] = {
    val n = dims + 1 // features + intercept
    val g = Array.ofDim[Double](n, n)
    val b = Array.ofDim[Double](n)
    gramRows.foreach { case (i, j, s) =>
      if (i <= dims && j <= dims) { g(i)(j) = s.toDouble; g(j)(i) = s.toDouble }
      else if (j == dims + 1 && i <= dims) b(i) = s.toDouble
    }
    (0 until dims).foreach(k => g(k)(k) += lambda)
    val A = breeze.linalg.DenseMatrix.tabulate(n, n)((i, j) => g(i)(j))
    val y = breeze.linalg.DenseVector(b)
    (breeze.linalg.pinv(A) * y).toArray
  }

  /** Corpus → weights in one pass + one driver solve. */
  def train(
      df: DataFrame,
      textCol: String,
      label: Column,
      dims: Int,
      lambda: Double = 1.0
  ): Array[Double] = {
    val rows = qualityGram(df, textCol, label, dims).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    trainRidge(rows, dims, lambda)
  }

  /** Classifier margin w·x + b as a pure column (positive ⇒ predicted
    * target class). `weights` is [[train]]'s output: dims feature weights
    * + intercept last.
    */
  def scoreCol(textCol: Column, weights: Array[Double]): Column = {
    val dims = weights.length - 1
    val x = TextHash.hashedBow(textCol, dims)
    (0 until dims).map(k => element_at(x, k + 1) * weights(k))
      .reduce(_ + _) + weights(dims)
  }
}
