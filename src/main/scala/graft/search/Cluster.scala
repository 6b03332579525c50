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
  def predictionCorr(grams: FoldGrams, subsets: Seq[Seq[Int]],
      ridge: Double = 0.0): Array[Array[Double]] = {
    val total = grams.folds.reduce(_ merge _)
    val p = total.m.rows
    val interceptIdx = p - 2
    val n = total.n.toDouble
    val betas = subsets.map(s => GramCV.solve(total, s, ridge)).toArray
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

/** UGS — union grouping selection across MULTIPLE base estimators
  * (ugs.py:589-705): each estimator clusters the candidate feature subsets
  * ("nodes") by prediction distance; the per-estimator groups are UNIONED
  * into tournament groups; nodes are scored by the cross-estimator mean
  * dampened by cross-estimator std and size-penalized; the best node per
  * tournament group survives, deduped and ranked.
  *
  * Estimators here are ridge-λ variants solved on the SAME one-pass fold
  * Grams (zero extra data passes — the multi-model axis costs only driver
  * linear algebra).
  */
object UnionGrouping {

  final case class Ranked(site: Int, score: Double)

  /** cal_t_group (ugs.py:630-669): node i's tournament group is the union,
    * over estimators, of every node co-clustered with i; DBSCAN noise
    * contributes the singleton {i} (the reference appends singles).
    */
  def tournamentGroups(labelsPerEstimator: Seq[Array[Int]]): Seq[Seq[Int]] = {
    val n = labelsPerEstimator.head.length
    (0 until n).map { i =>
      val members = scala.collection.mutable.SortedSet(i)
      labelsPerEstimator.foreach { labels =>
        if (labels(i) >= 0)
          members ++= labels.indices.filter(j => labels(j) == labels(i))
      }
      members.toSeq
    }
  }

  /** select_ugs (ugs.py:672-705): score = minmax(mean·(1−σ/σmax) −
    * α(e^(m−2)+1)); per-group argmax, site-deduped, ranked desc.
    */
  def selectUgs(
      groups: Seq[Seq[Int]],
      scoresPerEstimator: Seq[Array[Double]],
      sizes: Array[Int],
      alpha: Double = 0.01
  ): Seq[Ranked] = {
    val n = sizes.length
    val e = scoresPerEstimator.size.toDouble
    val mean = Array.tabulate(n)(i => scoresPerEstimator.map(_(i)).sum / e)
    val std = Array.tabulate(n) { i =>
      val m = mean(i)
      math.sqrt(scoresPerEstimator.map(s => (s(i) - m) * (s(i) - m)).sum / e)
    }
    val maxStd = math.max(std.max, 1e-12)
    val raw = Array.tabulate(n)(i =>
      mean(i) * (1.0 - std(i) / maxStd) - alpha * (math.exp(sizes(i) - 2.0) + 1.0))
    val (lo, hi) = (raw.min, raw.max)
    val scaled = raw.map(v => if (hi > lo) (v - lo) / (hi - lo) else 0.0)
    groups.map(g => g.maxBy(i => (scaled(i), -i)))
      .distinct
      .map(i => Ranked(i, scaled(i)))
      .sortBy(r => (-r.score, r.site))
  }

  /** Full multi-estimator UGS over fold Grams: per-λ clustering of the
    * prediction-distance matrix, tournament-group union, consensus ranking.
    */
  def run(
      grams: FoldGrams,
      subsets: Seq[Seq[Int]],
      ridges: Seq[Double],
      alpha: Double = 0.01
  ): Seq[Ranked] = {
    require(ridges.size >= 2, "UGS needs >= 2 base estimators (ugs.py:624)")
    // per-estimator distances: different λ → different predictions →
    // different clusterings (the whole point of the union)
    val dists = ridges.map(l => GroupingSelection.distanceFromCorr(
      GroupingSelection.predictionCorr(grams, subsets, l)))
    val labels = dists.map(d => GroupingSelection.cluster(d).labels)
    val scores = ridges.map(l => subsets.map(s => grams.cvR2(s, l)).toArray)
    selectUgs(tournamentGroups(labels), scores,
      subsets.map(_.size).toArray, alpha)
  }
}

/** SUM — consensus ranking of feature subsets across estimators by a
  * distance-threshold sweep (sum.py:96-135): each estimator nominates its
  * best node; a threshold grows from the global min to max prediction
  * distance, and a node enters the consensus ranking at the first threshold
  * where it is within distance of EVERY estimator's best node. (The
  * reference's Kamada-Kawai layout variant is a networkx/scipy plotting aid
  * over the same distances — visualization substrate, not reimplemented.)
  */
object SumConsensus {

  def distanceSweep(
      distPerEstimator: Seq[Array[Array[Double]]],
      scoresPerEstimator: Seq[Array[Double]],
      stepsPerNode: Int = 100
  ): Seq[(Int, Double)] = {
    val n = scoresPerEstimator.head.length
    val best = scoresPerEstimator.map(s => s.indices.maxBy(i => (s(i), -i)))
    val all = distPerEstimator.flatMap(_.toSeq.flatMap(_.toSeq))
    val (lo, hi) = (all.min, all.max)
    val steps = math.max(stepsPerNode * n, 2)
    val rank = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val seen = scala.collection.mutable.Set.empty[Int]
    for (k <- 0 until steps) {
      val t = lo + (hi - lo) * k / (steps - 1).toDouble
      val circle = (0 until n).filter(i =>
        distPerEstimator.zip(best).forall { case (d, b) => d(i)(b) <= t })
      for (i <- circle if !seen(i)) { seen += i; rank += ((i, t)) }
    }
    rank.toSeq
  }

  /** SUM over fold Grams with ridge-λ base estimators (distance = shared
    * 1−|corr| of subset predictions; scores = per-λ CV R²).
    */
  def run(
      grams: FoldGrams,
      subsets: Seq[Seq[Int]],
      ridges: Seq[Double]
  ): Seq[(Int, Double)] = {
    distanceSweep(
      ridges.map(l => GroupingSelection.distanceFromCorr(
        GroupingSelection.predictionCorr(grams, subsets, l))),
      ridges.map(l => subsets.map(s => grams.cvR2(s, l)).toArray))
  }
}
