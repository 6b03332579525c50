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

/** The reference's five `score_dim` acceptance modes (symbol/calculation/
  * scores.py:280-301) as canned predicates for `selKbestDim` /
  * `SymbolicSearch.Config.dimPolicy` — a reference user's `dim_type`
  * argument maps 1:1:
  *
  *  - `dim_type=None`      → [[any]]
  *  - `dim_type='integer'` → [[integer]] (all exponents integral)
  *  - `dim_type='coef'`    → [[coef]] (no NaN — any well-formed dim)
  *  - `dim_type=Dim`       → [[exact]] (fuzzy=False) / [[sameBase]] (fuzzy=True)
  *  - `dim_type=[Dim,...]` → [[oneOf]]
  */
object DimPolicy {
  /** dim_type None: everything scores 1. */
  val any: DimT => Boolean = _ => true

  /** 'integer': every exponent has zero fractional part (dimfunc.py:234-235);
    * the NaN sentinel fails (np.modf(nan) is truthy in np.any).
    */
  val integer: DimT => Boolean = {
    case Dim(v) => v.forall(e => e == math.floor(e))
    case _      => false
  }

  /** 'coef': accepted unless any exponent is NaN (dimfunc.py:226-227). */
  val coef: DimT => Boolean = !_.isNan

  /** Exact dim equality (fuzzy=False branch). */
  def exact(target: Dim): DimT => Boolean = _ == target

  /** Fuzzy same-base (dimfunc.py:237-255): exponent vectors are parallel —
    * other^‖self‖ == self^‖other‖.
    *
    * PARITY QUIRK, kept deliberately: the reference compares the two scaled
    * float vectors with EXACT equality (`others ** x1 == se ** x2`,
    * dimfunc.py:250), so genuinely parallel vectors can fail by one ulp of
    * the irrational norms — e.g. base (1,1) vs its cube (3,3):
    * 1·‖(3,3)‖ ≠ 3·‖(1,1)‖ in doubles. This port reproduces that behavior
    * bit-for-bit; use [[sameBaseRobust]] when you want mathematical
    * parallelism instead of reference parity.
    */
  def sameBase(target: Dim): DimT => Boolean = {
    case d: Dim =>
      val x1 = math.sqrt(d.v.map(x => x * x).sum)
      val x2 = math.sqrt(target.v.map(x => x * x).sum)
      target.v.map(_ * x1) == d.v.map(_ * x2)
    case _ => false
  }

  /** Same-base by exact cross-multiplication: v ∥ w iff v(i)·w(j) == v(j)·w(i)
    * for all i<j AND the vectors do not point in opposite directions.
    * Exact for the integral/small-rational exponents dims are made of (no
    * irrational norm enters), so (1,1) accepts (3,3) — the behavior
    * [[sameBase]]'s reference-parity float compare misses by one ulp.
    */
  def sameBaseRobust(target: Dim): DimT => Boolean = {
    case d: Dim if d.v.length == target.v.length =>
      val n = d.v.length
      val cross = (0 until n).forall(i => (i + 1 until n).forall(j =>
        d.v(i) * target.v(j) == d.v(j) * target.v(i)))
      val sameDirection = {
        val dot = (0 until n).map(i => d.v(i) * target.v(i)).sum
        val zt = target.v.forall(_ == 0.0); val zd = d.v.forall(_ == 0.0)
        zt || zd || dot > 0.0
      }
      cross && sameDirection
    case _ => false
  }

  /** List form: exact membership. */
  def oneOf(targets: Seq[Dim]): DimT => Boolean =
    d => targets.exists(t => (t: DimT) == d)
}
