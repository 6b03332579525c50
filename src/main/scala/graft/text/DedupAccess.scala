package graft.text

import org.apache.spark.sql.{Column, DataFrame}

/** Dev-tool access to [[Dedup]] internals for stage-level profiling
  * ([[graft.run.R06Dissect]]). Not an operator surface.
  */
object DedupAccess {
  def prep(df: DataFrame, idCol: String, textCol: String, blk: Column,
      n: Int): DataFrame = Dedup.prepDocs(df, idCol, textCol, blk, n)
  def freq(sides: Seq[DataFrame]): DataFrame = Dedup.shingleFreq(sides)
  def prefix(p: DataFrame, f: DataFrame, t: Double): DataFrame =
    Dedup.prefixOf(p, f, t)
  def mat(df: DataFrame): DataFrame = Dedup.materialize(df)
  def ppjoin(aPrefix: DataFrame, a: DataFrame,
      b: Option[(DataFrame, DataFrame)], t: Double): DataFrame =
    Dedup.ppjoinFromPrefixed(aPrefix, a, b, t)
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Dedup.mightContain(bloom, key)
  def dedupDocsFromPrepped(ids: DataFrame, prepped: DataFrame, idCol: String,
      t: Double, prefix: Option[DataFrame]): DataFrame =
    Dedup.dedupDocsFromPrepped(ids, prepped, idCol, t, prefix)
  def buildBlooms(keys: DataFrame, nDg: Long, nSh: Long,
      fpp: Double): (Array[Byte], Array[Byte]) = {
    import org.apache.spark.sql.functions.col
    val built = keys.agg(
      Dedup.bloomAggColAccess(col("dk"), nDg, fpp),
      Dedup.bloomAggColAccess(col("k"), nSh, fpp)).head()
    (built.getAs[Array[Byte]](0), built.getAs[Array[Byte]](1))
  }
}
