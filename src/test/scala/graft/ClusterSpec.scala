package graft

import scala.util.Random
import org.apache.spark.sql.functions._

import graft.expr.CoefFit
import graft.search._

class ClusterSpec extends GraftSuite {
  import spark.implicits._

  test("dbscan on a precomputed distance matrix finds planted clusters") {
    // two tight groups {0,1,2} and {3,4}, one outlier 5
    val coords = Array(0.0, 0.05, 0.1, 5.0, 5.05, 20.0)
    val dist = Array.tabulate(6, 6)((i, j) => math.abs(coords(i) - coords(j)))
    val labels = Dbscan.fit(dist, eps = 0.2, minPts = 2)
    assert(labels(0) == labels(1) && labels(1) == labels(2))
    assert(labels(3) == labels(4) && labels(3) != labels(0))
    assert(labels(5) == -1)
    val ch = ClusterScores.calinskiHarabasz(dist, labels)
    assert(ch > 10.0)
    val sdbw = ClusterScores.sDbw(dist, labels)
    assert(sdbw >= 0.0 && sdbw < 1.0) // well-separated -> low S_Dbw
  }

  test("grouping selection: correlated subsets cluster; penalty picks best") {
    val rnd = new Random(9)
    val rows = (1 to 400).map { i =>
      val x0 = rnd.nextDouble()
      val x1 = x0 + rnd.nextGaussian() * 0.01 // near-duplicate model input
      val x2 = rnd.nextDouble()
      (i.toLong, x0, x1, x2, 3.0 * x0 + 1.0 * x2 + rnd.nextGaussian() * 0.01)
    }
    val df = rows.toDF("id", "x0", "x1", "x2", "y")
    val grams = GramCV.fit(df, Seq("x0", "x1", "x2"), "y", 3, Seq(col("id")))
    val subsets = Seq(Seq(0), Seq(1), Seq(2), Seq(0, 2))
    val corr = GroupingSelection.predictionCorr(grams, subsets)
    assert(corr(0)(1) > 0.99, s"models on x0 vs x1 should predict alike, got ${corr(0)(1)}")
    assert(math.abs(corr(0)(2)) < 0.5)
    val res = GroupingSelection.cluster(
      GroupingSelection.distanceFromCorr(corr))
    assert(res.labels(0) == res.labels(1)) // x0-model with x1-model
    val scores = subsets.map(s => grams.cvR2(s)).toArray
    val groups = GroupingSelection.selectPerGroup(
      res.labels, scores, subsets.map(_.size).toArray)
    assert(groups.nonEmpty)
    // overall best subset {0,2} should be its group's pick
    val bestGroup = groups.find(_.members.contains(3))
    bestGroup.foreach(g => assert(g.best == 3))
  }

  test("premap: row-sum conservation under bind/update (reference invariant)") {
    val pm = PreMap.uniform(6)
    val sumsBefore = (0 until 6).map(pm.rowSum)
    val rnd = new Random(1)
    pm.bind(0, 3, 0.5)
    pm.update(Seq(1, 2, 4), rate = 0.2, rnd)
    val sumsAfter = (0 until 6).map(pm.rowSum)
    sumsBefore.zip(sumsAfter).foreach { case (a, b) => assert(approx(a, b, 1e-9)) }
    val cond = pm.conditional(0)
    assert(approx(cond.sum, 1.0))
    assert(cond(3) > cond(5)) // bound pair is now preferred
    val sampled = (1 to 200).map(_ => pm.samplePartner(0, rnd))
    assert(sampled.count(_ == 3) > sampled.count(_ == 5))
  }

  test("backforward CV picks a high-scoring support; premap-guided GP runs") {
    val rnd = new Random(21)
    val rows = (1 to 300).map { i =>
      val x0 = rnd.nextDouble(); val x1 = rnd.nextDouble(); val x2 = rnd.nextDouble()
      (i.toLong, x0, x1, x2, 4.0 * x0 + 2.0 * x2 + rnd.nextGaussian() * 0.001)
    }
    val df = rows.toDF("id", "x0", "x1", "x2", "y")
    val grams = GramCV.fit(df, Seq("x0", "x1", "x2"), "y", 3, Seq(col("id")))
    val (subset, score) = BackForwardCV.search(grams)
    assert(score > 0.999 && subset.contains(0) && subset.contains(2))
    // premap-guided symbolic search converges too (and its hall is valid)
    val reg = graft.expr.Registry(terminals = Map(
      "x0" -> (col("x0"), graft.expr.Dim.dless),
      "x2" -> (col("x2"), graft.expr.Dim.dless)))
    val res = SymbolicSearch.fit(df, reg, col("y"),
      SymbolicSearch.Config(popSize = 40, nGen = 8, maxHeight = 3,
        usePreMap = true))
    assert(res.best.score > 0.85, s"got ${res.best.score}")
    // selKbestDim pads with the best when fewer than k qualify
    val sel = SymbolicSearch.selKbestDim(res.hall, 5, reg, _.isDless)
    assert(sel.size == 5 || sel.isEmpty)
  }

  test("coef fit: linear terms via normal equations; nonlinear Gauss-Newton") {
    val rnd = new Random(4)
    val rows = (1 to 300).map { i =>
      val a = rnd.nextDouble() * 2; val b = rnd.nextDouble() * 3
      (a, b, 2.5 * a - 1.5 * b + 4.0 + rnd.nextGaussian() * 0.001)
    }
    val df = rows.toDF("a", "b", "y")
    val (w, intercept) = CoefFit.linearTerms(df, col("y"), Seq(col("a"), col("b")))
    assert(approx(w(0), 2.5, 1e-2) && approx(w(1), -1.5, 1e-2))
    assert(approx(intercept, 4.0, 1e-2))
    // nonlinear: y = A * exp(B x); fit (A, B) from a sample
    val sample = (1 to 200).map { i =>
      val x = i / 40.0
      (Array(x), 1.7 * math.exp(0.6 * x))
    }.toArray
    val theta = CoefFit.nonlinear(sample,
      (x, t) => t(0) * math.exp(t(1) * x(0)), Array(1.0, 0.1))
    assert(approx(theta(0), 1.7, 1e-2) && approx(theta(1), 0.6, 1e-2))
    // bounded deterministic sampling
    val s = CoefFit.sampleRows(df, Seq(col("a")), col("y"), 50)
    assert(s.length == 50)
  }
}
