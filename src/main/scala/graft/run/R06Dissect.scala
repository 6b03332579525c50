package graft.run

import org.apache.spark.sql.functions._

/** Round-6 dev tool: stage-level timing of the incremental-dedup family
  * (prep / blooms / freq+prefix / candidate+verify / CC) so optimization
  * targets the measured stage, not a guess. Mirrors the operator
  * composition; not a bench surface.
  */
object R06Dissect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.text.Dedup
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t[A](nm: String)(body: => A): A = {
      spark.sparkContext.setJobDescription(nm)
      val t0 = System.nanoTime(); val r = body
      println(f"[dissect] $nm: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println("[dissect] docs=" + docs.count())
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); tasks.addAndGet(e.stageInfo.numTasks)
        }
      })
    def counters(nm: String)(body: => Unit): Unit = {
      val (j0, s0, t0c) = (jobs.get, stages.get, tasks.get)
      body
      println(s"[dissect] $nm: jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - t0c}")
    }

    // q47 split: prep / keepers+exact / self-ppjoin / CC / anti
    for (r47 <- 1 to 2) {
      val p47 = t(s"q47 prep ($r47)")(graft.text.DedupAccess.prep(
        docs, "doc_id", "text", col("lang"), 3))
      t(s"q47 prep force ($r47)")(force(p47))
      val keepers = p47.withColumn("__keeper",
        min(col("id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("__md5"))))
      t(s"q47 keepers ($r47)")(force(
        keepers.where(col("id") =!= col("__keeper"))
          .select(col("__keeper").as("id_a"), col("id").as("id_b"))))
      val near = graft.text.DedupAccess.ppjoin(
        graft.text.DedupAccess.mat(graft.text.DedupAccess.prefix(
          p47, graft.text.DedupAccess.freq(Seq(p47)), 0.7)), p47, None, 0.7)
      t(s"q47 self ppjoin ($r47)")(force(near))
      t(s"q47 full ($r47)")(force(graft.text.Dedup.dedupDocs(
        docs, "doc_id", "text", col("lang"), 3, 0.7)))
      graft.text.Dedup.releaseCache()
    }
    for (round <- 1 to 2) {
      println(s"[dissect] ---- round $round ----")
      val batch = docs.where(pmod(col("doc_id"), lit(7L)) === 0)
      val corpus = docs.where(pmod(col("doc_id"), lit(7L)) =!= 0)
      val bp = t("prep bp")(graft.text.DedupAccess.prep(batch, "doc_id", "text", col("lang"), 3))
      val cp = t("prep cp")(graft.text.DedupAccess.prep(corpus, "doc_id", "text", col("lang"), 3))
      t("force bp")(force(bp))
      t("force cp")(force(cp))
      val (dg, shb) = t("bloomPairOf")(Dedup.bloomPairOf(cp, 0.03))
      import graft.text.DedupAccess
      val flagged = DedupAccess.mat(bp
        .withColumn("__exP", DedupAccess.mightContain(dg, xxhash64(col("__md5"))))
        .withColumn("__nearP", exists(col("sh"),
          h => DedupAccess.mightContain(shb, h))))
      t("q84 flagged materialize")(force(flagged))
      val freq = DedupAccess.mat(DedupAccess.freq(Seq(bp, cp)))
      t("q84 freq materialize")(force(freq))
      val bpPrefix = DedupAccess.mat(DedupAccess.prefix(bp, freq, 0.7))
      val cpPrefix = DedupAccess.mat(DedupAccess.prefix(cp, freq, 0.7))
      t("q84 prefix bp")(force(bpPrefix))
      t("q84 prefix cp")(force(cpPrefix))
      val exactHit = flagged.where(col("__exP"))
        .select(col("id"), col("__md5"))
        .join(cp.select(col("__md5")).distinct(), Seq("__md5"), "left_semi")
        .select(col("id"))
      t("q84 exactHit")(force(exactHit))
      val nearIds = flagged.where(col("__nearP")).select(col("id"))
      val nearHit = DedupAccess.ppjoin(cpPrefix, cp,
          Some((bpPrefix.join(nearIds, Seq("id"), "left_semi"), bp)), 0.7)
        .select(col("id_b").as("id")).distinct()
      t("q84 nearHit (cross ppjoin)")(force(nearHit))
      val inner = DedupAccess.dedupDocsFromPrepped(
        batch.select(col("doc_id")), bp, "doc_id", 0.7, Some(bpPrefix))
      t("q84 batch-internal dedupDocs (CC)")(force(inner))
      val out = inner
        .join(exactHit.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
        .join(nearHit.select(col("id").as("doc_id")), Seq("doc_id"), "left_anti")
      t("q84 final anti joins")(force(out))
      counters("q62 counters")(t("full q62 body")(force(Dedup.dedupIncremental(
        docs.where(pmod(col("doc_id"), lit(5L)) === 0),
        docs.where(pmod(col("doc_id"), lit(5L)) =!= 0),
        "doc_id", "text", col("lang"), 3, 0.7))))
      Dedup.releaseCache()
      counters("q84 counters")(t("full q84 body")(force(Dedup.dedupIncrementalBloom(
        batch, corpus, "doc_id", "text", col("lang"), 3, 0.7))))
      Dedup.releaseCache()
    }
    spark.stop()
  }
}
