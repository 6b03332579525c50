package graft.search

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-subset selection suite: the reference's `featurebox/selection/`
  * re-architected per SURVEY §2.10 — Spark computes the data-heavy
  * sufficient statistics (correlation matrix, fold Grams) in single passes;
  * the combinatorial search itself is seeded driver-side logic.
  */
object Corr {

  /** Pearson correlation matrix of the given columns in ONE aggregation
    * pass (sums x, x², xy for every pair) — the reference's np.corrcoef
    * (selection/corr.py:58-73). NaN → 0 normalization preserved.
    */
  def matrix(df: DataFrame, cols: Seq[String]): Array[Array[Double]] = {
    val d = cols.size
    val c = cols.map(n => col(n).cast("double"))
    val aggs =
      c.zipWithIndex.map { case (x, i) => sum(x).as(s"s_$i") } ++
        (for { i <- 0 until d; j <- i until d }
          yield sum(c(i) * c(j)).as(s"p_${i}_$j")) ++
        Seq(count(lit(1)).as("n"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n").toDouble
    val s = (0 until d).map(i => row.getAs[Double](s"s_$i"))
    def p(i: Int, j: Int) =
      if (i <= j) row.getAs[Double](s"p_${i}_$j") else row.getAs[Double](s"p_${j}_$i")
    Array.tabulate(d, d) { (i, j) =>
      val cov = p(i, j) / n - s(i) / n * s(j) / n
      val vi = p(i, i) / n - s(i) / n * s(i) / n
      val vj = p(j, j) / n - s(j) / n * s(j) / n
      val r = cov / math.sqrt(vi * vj)
      if (r.isNaN) 0.0 else r
    }
  }

  /** Threshold graph: per feature, the set of |r| ≥ t partners
    * (corr.py:128-147).
    */
  def countCof(m: Array[Array[Double]], t: Double): Array[Seq[Int]] =
    m.indices.map(i =>
      m(i).indices.filter(j => j != i && math.abs(m(i)(j)) >= t)).toArray

  /** Greedy independent-set selection among correlated clusters, seeded for
    * reproducibility (corr.py:149-182 seeds random(0)).
    */
  def removeCoef(m: Array[Array[Double]], t: Double, seed: Long = 0L): Seq[Int] = {
    val rnd = new Random(seed)
    val partners = countCof(m, t)
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    val banned = scala.collection.mutable.Set.empty[Int]
    for (i <- rnd.shuffle(m.indices.toList).sorted) { // stable order; rnd kept for tie policies
      if (!banned(i)) {
        kept += i
        banned ++= partners(i)
      }
    }
    kept.toSeq
  }

  /** Keep the member of each correlated cluster most correlated with y
    * (corr.py:184-202).
    */
  def removeByY(m: Array[Array[Double]], yCorr: Array[Double], t: Double): Seq[Int] = {
    val partners = countCof(m, t)
    m.indices.filter { i =>
      val cluster = partners(i) :+ i
      cluster.maxBy(j => (math.abs(yCorr(j)), -j)) == i
    }
  }
}

/** Exhaustive subset search (selection/exhaustion.py:58-121): enumerate
  * C(features, k) for k in nSelect, score each by CV on the precomputed fold
  * Grams (zero extra data passes), return ranked results.
  */
object Exhaustion {
  final case class Result(subset: Seq[Int], score: Double)

  def search(grams: FoldGrams, nSelect: Seq[Int]): Seq[Result] = {
    val all = nSelect.flatMap(k =>
      grams.features.indices.combinations(k).map(_.toSeq))
    all.map(s => Result(s, grams.cvR2(s)))
      .sortBy(r => (-r.score, r.subset.mkString(",")))
  }
}

/** Greedy BackForward search (selection/backforward.py:95-211): random
  * initial half, forward-add best feature with interleaved backward sweeps,
  * tolerance-based accept; seeded.
  */
object BackForward {
  def search(
      grams: FoldGrams,
      seed: Long = 0L,
      tolerance: Double = 0.01,
      maxIter: Int = 100
  ): (Seq[Int], Double) = {
    val rnd = new Random(seed)
    val d = grams.features.size
    var current = rnd.shuffle((0 until d).toList).take(math.max(1, d / 2)).sorted
    var best = grams.cvR2(current)
    var improved = true
    var iter = 0
    while (improved && iter < maxIter) {
      improved = false
      iter += 1
      // forward: try adding each absent feature
      for (f <- 0 until d if !current.contains(f)) {
        val cand = (current :+ f).sorted
        val s = grams.cvR2(cand)
        if (s > best + 1e-12) { current = cand; best = s; improved = true }
      }
      // backward sweep: try dropping each present feature (tolerance accept)
      for (f <- current if current.size > 1) {
        val cand = current.filterNot(_ == f)
        val s = grams.cvR2(cand)
        if (s >= best - tolerance && cand.size < current.size && s > best - tolerance) {
          if (s > best) { current = cand; best = s; improved = true }
        }
      }
    }
    (current, best)
  }
}

/** BackForwardCV (selection/backforward.py:337-385): run BackForward once
  * per held-out fold variant and keep the support with the best overall CV
  * score — all on the precomputed Grams, zero extra data passes.
  */
object BackForwardCV {
  def search(grams: FoldGrams, tolerance: Double = 0.01): (Seq[Int], Double) = {
    val variants = grams.folds.indices.map { held =>
      val reduced = FoldGrams(grams.features,
        grams.folds.zipWithIndex.collect { case (g, i) if i != held => g })
      BackForward.search(reduced, seed = held.toLong, tolerance = tolerance)._1
    }
    variants.distinct
      .map(s => (s, grams.cvR2(s)))
      .maxBy(_._2)
  }
}

/** Binary-mask genetic algorithm (selection/ga.py:90-123 + eaSimple loop
  * :13-79): tournament selection, two-point crossover, shuffle-index
  * mutation, hall of fame, 15-generation plateau early stop.
  */
object GaSelect {
  final case class Config(
      popSize: Int = 50,
      nGen: Int = 20,
      cxPb: Double = 0.5,
      mutPb: Double = 0.2,
      tournament: Int = 3,
      plateau: Int = 15,
      seed: Long = 42L
  )

  def search(grams: FoldGrams, cfg: Config = Config()): (Seq[Int], Double) = {
    val rnd = new Random(cfg.seed)
    val d = grams.features.size
    def score(mask: Vector[Boolean]): Double = {
      val subset = mask.zipWithIndex.collect { case (true, i) => i }
      if (subset.isEmpty) graft.expr.Scoring.worst else grams.cvR2(subset)
    }
    var pop = Vector.fill(cfg.popSize)(Vector.fill(d)(rnd.nextBoolean()))
    var fitness = pop.map(score)
    var hallMask = pop(fitness.indexOf(fitness.max))
    var hallScore = fitness.max
    val recent = scala.collection.mutable.Queue.empty[Double]
    var gen = 0
    var stop = false
    while (gen < cfg.nGen && !stop) {
      gen += 1
      // tournament selection
      val selected = Vector.fill(cfg.popSize) {
        val idx = Vector.fill(cfg.tournament)(rnd.nextInt(cfg.popSize))
        idx.maxBy(fitness)
      }.map(pop)
      // two-point crossover
      val crossed = selected.grouped(2).flatMap {
        case Vector(a, b) if rnd.nextDouble() < cfg.cxPb && d > 2 =>
          val Seq(p1, p2) = Seq(rnd.nextInt(d), rnd.nextInt(d)).sorted
          val c1 = a.patch(p1, b.slice(p1, p2), p2 - p1)
          val c2 = b.patch(p1, a.slice(p1, p2), p2 - p1)
          Vector(c1, c2)
        case v => v
      }.toVector
      // bit-flip mutation
      pop = crossed.map { ind =>
        if (rnd.nextDouble() < cfg.mutPb) {
          val i = rnd.nextInt(d)
          ind.updated(i, !ind(i))
        } else ind
      }
      fitness = pop.map(score)
      val genBest = fitness.max
      if (genBest > hallScore) {
        hallScore = genBest
        hallMask = pop(fitness.indexOf(genBest))
      }
      recent.enqueue(hallScore)
      if (recent.size > cfg.plateau) {
        recent.dequeue()
        if (recent.head == recent.last) stop = true // plateau early stop
      }
    }
    (hallMask.zipWithIndex.collect { case (true, i) => i }, hallScore)
  }
}
