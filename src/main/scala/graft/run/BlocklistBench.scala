package graft.run

import org.apache.spark.sql.functions._

/** Round-5 verdict task #5: measure [[graft.functions.AcAutomaton]] at
  * production blocklist sizes — build time, Java-serialized size (it
  * ships per-plan as a codegen reference object, so this IS the
  * task-broadcast cost) and corpus scoring throughput vs the
  * list-as-data [[graft.text.Blocklist.scoreJoin]] path on the same
  * corpus — so the "which path at what list size" guidance in the
  * Blocklist scaladoc carries a number. Results: BASELINE.md §7.
  *
  * Usage: BlocklistBench [sfDir] [listSizes,...] [repeats]
  */
object BlocklistBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sizes = (if (args.length > 1) args(1) else "1000,10000,100000,1000000")
      .split(",").map(_.toInt).toSeq
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()
    // synthesized phrase lists at each size: a realistic mix — 30%
    // stop-word-initial two-word phrases, 70% rare-token phrases; none
    // match the corpus except a planted 1% (so the verify path runs)
    val vocab = docs.select(explode(graft.text.TextHash.lowerTokens(col("text")))
      .as("t")).groupBy($"t").count()
      .orderBy($"count".desc).limit(500).as[(String, Long)].collect().map(_._1)
    def phraseList(k: Int): Seq[String] = (0 until k).map { i =>
      if (i % 100 == 0 && vocab.length >= 2)
        s"${vocab(i % vocab.length)} ${vocab((i + 1) % vocab.length)}" // may match
      else if (i % 10 < 3) s"the zzz$i never$i"
      else s"qq$i zz$i"
    }

    for (k <- sizes) {
      val phrases = phraseList(k)
      // 1. automaton path (Blocklist.score): build + serialized size +
      // corpus throughput. An OOM on the build IS a result (the per-state
      // goto maps exhaust a default driver heap near 10^6 patterns) — the
      // bench records it and still measures the list-as-data path.
      val autoRes: Either[Throwable, (Double, Double, Double)] =
        try {
          val t0 = System.nanoTime()
          val ac = new graft.functions.AcAutomaton(
            phrases.map(p => s" $p ").toArray)
          val buildS = (System.nanoTime() - t0) / 1e9
          val bos = new java.io.ByteArrayOutputStream()
          val oos = new java.io.ObjectOutputStream(bos)
          oos.writeObject(ac); oos.close()
          val serMb = bos.size() / 1048576.0
          val scoreTimes = (1 to repeats).map { _ =>
            val t = System.nanoTime()
            force(graft.text.Blocklist.score(docs, col("text"),
              terms = phrases))
            (System.nanoTime() - t) / 1e9
          }
          Right((buildS, serMb, scoreTimes.min))
        } catch { case t: Throwable => Left(t) }
      // 2. list-as-data path (scoreJoin) over the same corpus + list
      val termsDf = phrases.toDF("term")
      val joinTimes = (1 to repeats).map { _ =>
        val t = System.nanoTime()
        force(graft.text.Blocklist.scoreJoin(docs, "doc_id", col("text"),
          termsDf))
        (System.nanoTime() - t) / 1e9
      }
      autoRes match {
        case Right((buildS, serMb, sc)) =>
          println(f"[blbench] k=$k%-8d build=${buildS}%.2fs ser=${serMb}%.1fMB " +
            f"score=${sc}%.2fs scoreJoin=${joinTimes.min}%.2fs (docs=$nDocs)")
        case Left(t) =>
          println(f"[blbench] k=$k%-8d automaton FAILED (${t.getClass.getSimpleName}: " +
            f"${String.valueOf(t.getMessage).take(60)}) " +
            f"scoreJoin=${joinTimes.min}%.2fs (docs=$nDocs)")
      }
    }
    spark.stop()
  }
}
