package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 validity-interval dimension join — the "explicit interval" twin of
  * [[AsOf.asofJoin]].
  *
  * A slowly-changing dimension stores each key's versions with a validity
  * window `[eff_start, eff_end)` (latest version open-ended, `eff_end` null).
  * `intervalJoin` attaches to each fact row the version whose window contains
  * the fact timestamp. Where [[AsOf]] derives "latest at or before ts" from a
  * bare snapshot history in one shuffle, this operator consumes dimensions
  * that ALREADY carry intervals (the shape every SCD-2 warehouse table and
  * Iceberg `valid_from`/`valid_to` layout exports). Reference analog:
  * featurebox binds per-entity property tables to observations by lookup
  * (featurebox/data/check_data.py's element-table binding); the interval
  * form is that lookup made time-aware.
  *
  * Shape (the 100 TB story): an EQUI-join on the key with the range
  * predicate as the join residual — Catalyst plans a broadcast or sort-merge
  * hash on `key` alone, so there is no theta-join/cartesian blowup; the
  * residual filters version candidates inside the join. SCD-2 dimensions
  * have a bounded, small version count per key (that is what "slowly
  * changing" means), so the per-key candidate set is tiny and AQE's skew
  * split handles mega-keys on the fact side. If a dimension's per-key
  * version count is NOT bounded, use [[AsOf.asofJoin]] instead — its
  * union+window plan never materializes per-key products at all.
  *
  * Because intervals produced by [[validityIntervals]] are disjoint and
  * half-open per key, each fact row matches AT MOST one version: the join is
  * row-preserving (left) or row-filtering (inner), never row-multiplying —
  * and never leaks the future (`ts < eff_end` of a version that STARTED in
  * the past is a statement about the past only).
  */
object Intervals {

  /** Derive SCD-2 validity intervals from a snapshot history: each
    * `(key, ts)` version is valid from its own timestamp until the key's
    * next version (`eff_end` null for the current version).
    *
    * Input must be unique per `(key, tsCol)` — dedup first (e.g. keep the
    * max-tiebreak row per timestamp) or the overlapping duplicates will
    * multiply fact rows in [[intervalJoin]]. One window pass, one shuffle.
    */
  def validityIntervals(
      snapshots: DataFrame,
      key: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
    snapshots
      .withColumn("eff_end", lead(col(tsCol), 1).over(w))
      .withColumnRenamed(tsCol, "eff_start")
  }

  /** Join each fact row to the dimension version whose `[startCol, endCol)`
    * validity window contains `factTs` (null `endCol` = open-ended).
    *
    * @param fact    probe side
    * @param dim     SCD-2 dimension with disjoint per-key intervals
    * @param key     equi-join key present on both sides
    * @param factTs  fact timestamp column name
    * @param startCol inclusive validity start column on `dim`
    * @param endCol   exclusive validity end column on `dim` (null = open)
    * @param payload  dim columns to carry (emitted under the same names)
    * @param joinType "left" keeps pre-history facts with null payload
    */
  def intervalJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factTs: String,
      startCol: String,
      endCol: String,
      payload: Seq[String],
      joinType: String = "left"): DataFrame = {
    require(Seq("left", "inner").contains(joinType),
      s"joinType must be left or inner, got $joinType")
    // the emitted dim columns are startCol, endCol and the payload minus
    // the join key — any overlap among them, or with fact's own columns,
    // would emit duplicate names and poison every downstream col() lookup
    val emitted = Seq(startCol, endCol) ++
      payload.filterNot(c => c == key || c == startCol || c == endCol)
    require(emitted.distinct.size == emitted.size,
      s"payload overlaps start/end columns: $payload")
    val clash = emitted.filter(fact.columns.contains)
    require(clash.isEmpty,
      s"dim columns $clash collide with fact columns — rename one side")
    // rename the dim side wholesale before joining: when fact and dim share
    // lineage (both derived from one table — the common case) attribute-based
    // disambiguation (`fact(key) === d(key)`) degrades to a trivially-true
    // predicate; distinct names make the condition unambiguous by construction
    val dimCols = (Seq(key, startCol, endCol) ++ payload).distinct
    val d = dim.select(dimCols.map(c => col(c).as(s"__dim_$c")): _*)
    val cond = fact(key) === col(s"__dim_$key") &&
      fact(factTs) >= col(s"__dim_$startCol") &&
      (col(s"__dim_$endCol").isNull || fact(factTs) < col(s"__dim_$endCol"))
    fact.join(d, cond, joinType)
      .select(fact.columns.map(fact(_)) ++
        emitted.map(c => col(s"__dim_$c").as(c)): _*)
  }
}
