package graft.search

import scala.collection.mutable

/** Driver-side clustering kit backing the GS/UGS "union grouping selection"
  * family (featurebox/selection/ugs.py, cluster.py, sdw.py). The matrices
  * these operate on are (n_subsets × n_subsets) — tiny — so the algorithms
  * run on the driver; Spark produces the prediction columns they consume
  * (see [[GroupingSelection]]).
  */
object Dbscan {

  /** Plain DBSCAN over a precomputed distance matrix (ugs.py:159-197 uses
    * sklearn DBSCAN with metric='precomputed'). Labels: -1 noise, else
    * 0-based cluster ids in discovery order.
    */
  def fit(dist: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    val n = dist.length
    val labels = Array.fill(n)(-2) // -2 unvisited, -1 noise
    def neighbors(i: Int): Seq[Int] =
      (0 until n).filter(j => dist(i)(j) <= eps)
    var cluster = -1
    for (i <- 0 until n if labels(i) == -2) {
      val nb = neighbors(i)
      if (nb.size < minPts) labels(i) = -1
      else {
        cluster += 1
        labels(i) = cluster
        val queue = mutable.Queue(nb: _*)
        while (queue.nonEmpty) {
          val j = queue.dequeue()
          if (labels(j) == -1) labels(j) = cluster
          if (labels(j) == -2) {
            labels(j) = cluster
            val nj = neighbors(j)
            if (nj.size >= minPts) queue.enqueueAll(nj)
          }
        }
      }
    }
    labels
  }
}

object ClusterScores {

  /** Calinski-Harabasz index over a 1-D embedding of points given cluster
    * labels (ugs.py:130-156 scores eps sweeps with CH). Points here are
    * rows of an arbitrary-dimension matrix.
    */
  def calinskiHarabasz(points: Array[Array[Double]], labels: Array[Int]): Double = {
    val valid = labels.zipWithIndex.filter(_._1 >= 0)
    if (valid.isEmpty) return 0.0
    val ks = valid.map(_._1).distinct
    if (ks.length < 2) return 0.0
    val d = points(0).length
    val n = valid.length
    val mean = Array.tabulate(d)(c => valid.map(v => points(v._2)(c)).sum / n)
    var ssb = 0.0; var ssw = 0.0
    for (k <- ks) {
      val members = valid.filter(_._1 == k).map(_._2)
      val cm = Array.tabulate(d)(c => members.map(points(_)(c)).sum / members.length)
      ssb += members.length *
        (0 until d).map(c => math.pow(cm(c) - mean(c), 2)).sum
      ssw += members.map(i =>
        (0 until d).map(c => math.pow(points(i)(c) - cm(c), 2)).sum).sum
    }
    if (ssw == 0) 0.0
    else (ssb / (ks.length - 1)) / (ssw / (n - ks.length))
  }

  /** S_Dbw cluster-validity index (featurebox/selection/sdw.py:13-155):
    * scatter term + density-between term; lower is better.
    */
  def sDbw(points: Array[Array[Double]], labels: Array[Int]): Double = {
    val ks = labels.distinct.filter(_ >= 0).sorted
    if (ks.length < 2) return Double.MaxValue
    val d = points(0).length
    def variance(idx: Array[Int]): Array[Double] = {
      val m = Array.tabulate(d)(c => idx.map(points(_)(c)).sum / idx.length)
      Array.tabulate(d)(c => idx.map(i => math.pow(points(i)(c) - m(c), 2)).sum / idx.length)
    }
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val all = labels.indices.toArray
    val clusterIdx = ks.map(k => labels.indices.filter(labels(_) == k).toArray)
    val centers = clusterIdx.map(idx =>
      Array.tabulate(d)(c => idx.map(points(_)(c)).sum / idx.length))
    // scatter
    val varAll = norm(variance(all))
    val scat = clusterIdx.map(idx => norm(variance(idx)) / varAll).sum / ks.length
    // density between
    val stdev = math.sqrt(clusterIdx.map(idx => norm(variance(idx))).sum) / ks.length
    def density(center: Array[Double], idx: Array[Int]): Int =
      idx.count { i =>
        math.sqrt((0 until d).map(c => math.pow(points(i)(c) - center(c), 2)).sum) <= stdev
      }
    var dens = 0.0
    for (a <- ks.indices; b <- ks.indices if a != b) {
      val mid = Array.tabulate(d)(c => (centers(a)(c) + centers(b)(c)) / 2)
      val union = clusterIdx(a) ++ clusterIdx(b)
      val dm = density(mid, union).toDouble
      val da = math.max(density(centers(a), clusterIdx(a)),
        density(centers(b), clusterIdx(b))).toDouble
      if (da > 0) dens += dm / da
    }
    dens /= ks.length * (ks.length - 1)
    scat + dens
  }
}

/** GS "grouping selection" (ugs.py:200-587) re-architected:
  *  1. per-subset CV predictions are Spark-evaluated ONCE (fold-Gram OLS —
  *     no per-subset data passes; see GramCV);
  *  2. the pairwise prediction-distance matrix 1 − corr(ŷ_i, ŷ_j) is
  *     computed from Spark-aggregated cross-products;
  *  3. the eps sweep + DBSCAN + Calinski-Harabasz pick + per-cluster
  *     penalized argmax run on the driver (matrix is n_subsets²).
  */
object GroupingSelection {

  final case class Group(members: Seq[Int], best: Int, bestScore: Double)
  final case class Result(labels: Array[Int], eps: Double, groups: Seq[Group])

  /** Pairwise correlation of the OLS predictions of feature subsets,
    * computed ENTIRELY from the one-pass fold Grams — the reference
    * re-predicts per subset pair (ugs.py:404-441); here
    * ŷ_i'ŷ_j = β_i' G[cols_i, cols_j] β_j, so no data is touched at all.
    */
  def predictionCorr(grams: FoldGrams, subsets: Seq[Seq[Int]]): Array[Array[Double]] = {
    val total = grams.folds.reduce(_ merge _)
    val p = total.m.rows
    val interceptIdx = p - 2
    val n = total.n.toDouble
    val betas = subsets.map(s => GramCV.solve(total, s)).toArray
    val cols = subsets.map(s => (s :+ interceptIdx).toArray).toArray
    def cross(i: Int, j: Int): Double = {
      var acc = 0.0
      for (a <- cols(i).indices; b <- cols(j).indices)
        acc += betas(i)(a) * betas(j)(b) * total.m(cols(i)(a), cols(j)(b))
      acc
    }
    def mean(i: Int): Double = {
      var acc = 0.0
      for (a <- cols(i).indices) acc += betas(i)(a) * total.m(cols(i)(a), interceptIdx)
      acc / n
    }
    val k = subsets.size
    Array.tabulate(k, k) { (i, j) =>
      val cov = cross(i, j) / n - mean(i) * mean(j)
      val vi = cross(i, i) / n - mean(i) * mean(i)
      val vj = cross(j, j) / n - mean(j) * mean(j)
      val r = cov / math.sqrt(vi * vj)
      if (r.isNaN) 0.0 else math.max(-1.0, math.min(1.0, r))
    }
  }

  /** Distance matrix from a (nSubsets × nSubsets) prediction-correlation
    * matrix: d = 1 − |r|.
    */
  def distanceFromCorr(corr: Array[Array[Double]]): Array[Array[Double]] =
    corr.map(_.map(r => 1.0 - math.abs(r)))

  /** eps sweep 0.05..0.95 step 0.01, keep the labeling with the best CH
    * score (ugs.py:507-521).
    */
  def cluster(dist: Array[Array[Double]], minPts: Int = 2): Result = {
    val points = dist // rows of the distance matrix as the embedding
    var best: Option[(Double, Double, Array[Int])] = None
    var eps = 0.05
    while (eps <= 0.95) {
      val labels = Dbscan.fit(dist, eps, minPts)
      val ch = ClusterScores.calinskiHarabasz(points, labels)
      if (best.forall(_._1 < ch) && labels.exists(_ >= 0)) {
        best = Some((ch, eps, labels))
      }
      eps += 0.01
    }
    val (_, bEps, bLabels) = best.getOrElse(
      (0.0, 0.5, Array.fill(dist.length)(-1)))
    Result(bLabels, bEps, Nil)
  }

  /** Select the best member of each cluster under the size penalty
    * score·(1−σ/σmax) − α(e^(m−2)+1) (ugs.py:542-572).
    */
  def selectPerGroup(
      labels: Array[Int],
      scores: Array[Double],
      sizes: Array[Int],
      alpha: Double = 0.01
  ): Seq[Group] = {
    val sigmaMax = math.max(scores.max - scores.min, 1e-12)
    def penalized(i: Int): Double = {
      val sigma = scores.max - scores(i)
      scores(i) * (1.0 - sigma / sigmaMax) - alpha * (math.exp(sizes(i) - 2.0) + 1.0)
    }
    labels.distinct.filter(_ >= 0).sorted.map { k =>
      val members = labels.indices.filter(labels(_) == k)
      val best = members.maxBy(penalized)
      Group(members, best, scores(best))
    }
  }
}
