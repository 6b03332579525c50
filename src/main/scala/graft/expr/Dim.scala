package graft.expr

/** Dimension (unit) type: a 7-vector of SI exponents with its own algebra,
  * reimplementing the reference's `Dim` (featurebox/symbol/functions/
  * dimfunc.py:114-142) and its propagation rules (dim_map, :29-111):
  *
  *  - add/sub require equal dims, else the NaN sentinel (dimfunc.py:159-167)
  *  - mul adds exponents, div subtracts (:181-185)
  *  - pow scales exponents (:175-179)
  *  - exp/ln/sin/cos require dimensionless, else NaN (:96-106)
  *
  * Evaluated at plan-construction time over the expression ADT (pure Scala,
  * no Spark involvement) — the engine's static typechecker that prunes
  * ill-typed candidate expressions before any cluster work.
  */
sealed trait DimT {
  def isNan: Boolean = this == DNan
  def isDless: Boolean = this == Dim.dless

  def +(o: DimT): DimT = (this, o) match {
    case (a: Dim, b: Dim) if a == b => a
    case _                          => DNan
  }
  def -(o: DimT): DimT = this + o
  def *(o: DimT): DimT = (this, o) match {
    case (Dim(a), Dim(b)) => Dim(a.zip(b).map { case (x, y) => x + y })
    case _                => DNan
  }
  def /(o: DimT): DimT = (this, o) match {
    case (Dim(a), Dim(b)) => Dim(a.zip(b).map { case (x, y) => x - y })
    case _                => DNan
  }
  def pow(p: Double): DimT = this match {
    case Dim(a) => Dim(a.map(_ * p))
    case _      => DNan
  }
  /** exp/ln/sin/cos: defined only on dimensionless input. */
  def transcendental: DimT =
    if (this == Dim.dless) Dim.dless else DNan
}

final case class Dim(v: Vector[Double]) extends DimT {
  require(v.size == 7, "SI dimension vector has 7 exponents")
}

/** The `dnan` sentinel (dimfunc.py:560): propagates through everything. */
case object DNan extends DimT

object Dim {
  val dless: Dim = Dim(Vector.fill(7)(0.0))
  def of(exps: (Int, Double)*): Dim =
    Dim(exps.foldLeft(Vector.fill(7)(0.0)) { case (v, (i, e)) => v.updated(i, e) })
}
