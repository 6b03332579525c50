package graft

import org.apache.spark.sql.functions._

import graft.featurize.{Composition, FormulaParser, Magnitude, Poly, UnionPool}
import graft.stats.{StatRegistry, WeightedStats}

class FeaturizeSpec extends GraftSuite {
  import spark.implicits._

  test("formula parser: reference Ele-algebra semantics") {
    assert(FormulaParser.parse("H2O") == Map("H" -> 2.0, "O" -> 1.0))
    assert(FormulaParser.parse("H2O0.5") == Map("H" -> 2.0, "O" -> 0.5))
    assert(FormulaParser.parse("(Al2O3)3Mg0.5") ==
      Map("Al" -> 6.0, "O" -> 9.0, "Mg" -> 0.5))
    assert(FormulaParser.parse("((AB)2C)2") ==
      Map("A" -> 4.0, "B" -> 4.0, "C" -> 2.0))
    intercept[IllegalArgumentException](FormulaParser.parse("h2O"))
  }

  test("weighted stats match hand-computed numpy-convention values") {
    // x = [1,2,3,4], w = [1,1,2,1] — reference formulas from extrastats.py
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 2.0), (4.0, 1.0)).toDF("x", "w")
    val row = df.agg(
      WeightedStats.mean($"x", $"w").as("mean"),
      WeightedStats.stdDevWeighted($"x", $"w").as("std"),
      WeightedStats.skewness($"x", $"w").as("skew"),
      WeightedStats.kurtosisPearson($"x", $"w").as("kurt"),
      WeightedStats.holderMean($"x", $"w", 0.0).as("geom"),
      WeightedStats.holderMean($"x", $"w", -1.0).as("harm"),
      WeightedStats.variancePop($"x", $"w").as("var")
    ).head()
    val sw = 5.0; val mu = (1 + 2 + 6 + 4) / sw // 2.6
    assert(approx(row.getAs[Double]("mean"), mu))
    val u2 = (1 + 4 + 18 + 16) / sw - mu * mu
    assert(approx(row.getAs[Double]("var"), u2))
    // beta = 5/(25-7) ; m2 = Σw(x-mu)^2
    val m2 = 1 * math.pow(1 - mu, 2) + 1 * math.pow(2 - mu, 2) +
      2 * math.pow(3 - mu, 2) + 1 * math.pow(4 - mu, 2)
    assert(approx(row.getAs[Double]("std"), math.sqrt(5.0 / 18.0 * m2)))
    val u3 = (1 + 8 + 54 + 64) / sw - 3 * mu * ((1 + 4 + 18 + 16) / sw) +
      2 * mu * mu * mu
    assert(approx(row.getAs[Double]("skew"), u3 / math.pow(u2, 1.5)))
    val m1 = mu; val mm2 = (1 + 4 + 18 + 16) / sw
    val mm3 = (1 + 8 + 54 + 64) / sw; val mm4 = (1 + 16 + 162 + 256) / sw
    val u4 = mm4 - 4 * mu * mm3 + 6 * mu * mu * mm2 - 3 * math.pow(mu, 3) * m1
    assert(approx(row.getAs[Double]("kurt"), u4 / (u2 * u2)))
    assert(approx(row.getAs[Double]("geom"),
      math.exp((math.log(1) + math.log(2) + 2 * math.log(3) + math.log(4)) / sw)))
    assert(approx(row.getAs[Double]("harm"), sw / (1.0 + 0.5 + 2.0 / 3 + 0.25)))
  }

  test("NaN-poisoned min/max and single-row degenerate stats") {
    val df = Seq(1.0, Double.NaN, 3.0).toDF("x").withColumn("w", lit(1.0))
    val r = df.agg(WeightedStats.minNaN($"x").as("mn"),
      WeightedStats.maxNaN($"x").as("mx")).head()
    assert(r.getDouble(0).isNaN && r.getDouble(1).isNaN)
    val one = Seq((5.0, 2.0)).toDF("x", "w")
    val r1 = one.agg(WeightedStats.stdDevWeighted($"x", $"w").as("s"),
      WeightedStats.skewness($"x", $"w").as("sk")).head()
    assert(r1.getDouble(0) == 0.0 && r1.getDouble(1) == 0.0)
  }

  test("mode min tie-break: smallest among most frequent") {
    val df = Seq(("g", 3.0), ("g", 3.0), ("g", 1.0), ("g", 1.0), ("g", 2.0))
      .toDF("k", "v")
    val out = WeightedStats.modeMinTie(df, Seq("k"), "v").head()
    assert(out.getDouble(1) == 1.0) // 1.0 and 3.0 both count 2 -> min wins
  }

  test("stat registry dispatch: holder_mean::2 equals manual power mean") {
    val df = Seq((2.0, 1.0), (4.0, 3.0)).toDF("x", "w")
    val got = df.agg(StatRegistry("holder_mean::2")($"x", $"w").as("h")).head()
      .getDouble(0)
    assert(approx(got, math.sqrt((4.0 + 48.0) / 4.0)))
    intercept[IllegalArgumentException](StatRegistry("nope"))
  }

  test("composition featurizer: explode+broadcast-join+pool vs hand calc") {
    val long = Seq(("e1", "a", 2.0), ("e1", "b", 1.0), ("e2", "b", 3.0))
      .toDF("entity", "part", "n")
    val lookup = Seq(("a", 10.0), ("b", 40.0)).toDF("part", "attr")
    val out = Composition
      .featurize(long, lookup, "entity", "part", Seq("attr"))
      .collect().map(r => r.getString(0) -> r).toMap
    val e1 = out("e1")
    assert(approx(e1.getAs[Double]("attr_wavg"), (2 * 10 + 40) / 3.0))
    assert(approx(e1.getAs[Double]("attr_wsum"), 60.0))
    assert(approx(e1.getAs[Double]("attr_maxp"), 40.0))
    assert(approx(e1.getAs[Double]("attr_minp"), 10.0))
    assert(approx(e1.getAs[Double]("attr_geom"),
      math.exp((2 * math.log(10) + math.log(40)) / 3.0)))
    val e2 = out("e2")
    assert(approx(e2.getAs[Double]("attr_wavg"), 40.0))
    assert(approx(e2.getAs[Double]("attr_wvar"), 0.0))
  }

  test("poly features: labels and values mirror the reference") {
    val df = Seq((2.0, 3.0)).toDF("x0", "x1")
    val out = Poly.transform(df, Seq("x0", "x1"), Seq(0, 1, 2)).head()
    val schema = Poly.transform(df, Seq("x0", "x1"), Seq(0, 1, 2)).columns
    assert(schema.contains("x0^2*x1^1"))
    val idx = schema.indexOf("x0^2*x1^1")
    assert(out.getDouble(idx) == 12.0)
    intercept[IllegalArgumentException](Poly.degreeTuples(30, Seq(0, 1, 2)))
  }

  test("magnitude transformer: fit/transform/inverse round-trip") {
    val df = Seq(12345.0, 23456.0, 34567.0).toDF("x")
    val m = Magnitude.fit(df, Seq("x"))
    assert(m.scales("x") == 10000.0)
    val t = m.transform(df).as[Double].collect().sorted
    assert(approx(t(0), 1.2345))
    val back = m.inverse(m.transform(df)).as[Double].collect().sorted
    assert(approx(back(0), 12345.0))
  }

  test("union row-pool via higher-order functions") {
    val df = Seq((1.0, 2.0, 3.0)).toDF("a", "b", "c")
    val r = UnionPool.rowStats(df, Seq("a", "b", "c")).head()
    assert(approx(r.getAs[Double]("row_mean"), 2.0))
    assert(approx(r.getAs[Double]("row_std"), math.sqrt(2.0 / 3.0)))
    assert(r.getAs[Double]("row_min") == 1.0)
    assert(r.getAs[Double]("row_max") == 3.0)
  }

  test("token counts map featurizer") {
    val df = Seq("a b a c b a").toDF("text")
    val m = df.select(FormulaParser.tokenCounts($"text").as("m"))
      .head().getAs[Map[String, Double]]("m")
    assert(m == Map("a" -> 3.0, "b" -> 2.0, "c" -> 1.0))
  }

  test("weighted quantile: frequency semantics, numpy parity at unit weights") {
    import graft.stats.WeightedStats
    // frequency expansion of ((1,w1),(2,w2),(3,w1)) = [1,2,2,3]:
    // np.quantile([1,2,2,3], .5) = 2.0; .25 -> h=0.75 -> 1.75; .9 -> 2.7
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 1.0)).toDF("x", "w")
    val r = df.agg(
      WeightedStats.weightedQuantile($"x", $"w", 0.5).as("q50"),
      WeightedStats.weightedQuantile($"x", $"w", 0.25).as("q25"),
      WeightedStats.weightedQuantile($"x", $"w", 0.9).as("q90")).head()
    assert(approx(r.getAs[Double]("q50"), 2.0))
    assert(approx(r.getAs[Double]("q25"), 1.75))
    assert(approx(r.getAs[Double]("q90"), 2.7))
    // unit weights reduce EXACTLY to the unweighted percentile
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val dfu = vals.map((_, 1.0)).toDF("x", "w")
    for (q <- Seq(0.1, 0.5, 0.77)) {
      val both = dfu.agg(
        WeightedStats.weightedQuantile($"x", $"w", q).as("wq"),
        WeightedStats.quantile($"x", q).as("uq")).head()
      assert(approx(both.getAs[Double]("wq"), both.getAs[Double]("uq")),
        s"q=$q: ${both.getAs[Double]("wq")} vs ${both.getAs[Double]("uq")}")
    }
    // fractional weights: interpolation on the weighted CDF virtual index
    // ((10,0.5),(20,1.5)): W=2, h(q=.5)=0.5; cum: 0.5, 2.0 -> vlo=10 (cum>0)
    // ... vhi=20 (cum>1) -> 10 + 0.5*(20-10) = 15
    val frac = Seq((10.0, 0.5), (20.0, 1.5)).toDF("x", "w")
    val f = frac.agg(WeightedStats.weightedQuantile($"x", $"w", 0.5).as("q")).head()
    assert(approx(f.getAs[Double]("q"), 15.0))
    // dispatch path
    val viaReg = df.agg(graft.stats.StatRegistry("wquantile::0.5")($"x", $"w").as("q")).head()
    assert(approx(viaReg.getAs[Double]("q"), 2.0))
  }
}
