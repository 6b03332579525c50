package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.core.Transcripts
import graft.lake.IcebergLite
import graft.run.{FeatureFactory, Flagship}

class FactorySpec extends GraftSuite {

  test("feature factory: kill mid-run, resume, output equals single-job plan") {
    val work = Files.createTempDirectory("factory").toString
    val nBuckets = 4
    val (tRoot, sRoot) = FeatureFactory.ensureBucketedInput(spark, work, 60, nBuckets)

    // first run dies at bucket 2
    intercept[RuntimeException] {
      FeatureFactory.run(spark, tRoot, sRoot, s"$work/features", nBuckets,
        failAtBucket = Some(2))
    }
    val doneAfterKill = IcebergLite.readSnapshot(s"$work/features")
      .map(_.partitions.keySet).getOrElse(Set.empty[Int])
    assert(doneAfterKill == Set(0, 1))

    // resume: only the remaining buckets run
    val processed = FeatureFactory.run(spark, tRoot, sRoot, s"$work/features", nBuckets)
    assert(processed == 2)
    val snap = IcebergLite.readSnapshot(s"$work/features").get
    assert(snap.partitions.keySet == Set(0, 1, 2, 3))

    // equivalence with the single-job pipeline over the unbucketed input
    val whole = Flagship.pipeline(
      IcebergLite.readTable(spark, tRoot).drop("bucket"),
      IcebergLite.readTable(spark, sRoot).drop("bucket"))
    val factory = spark.read.parquet(s"$work/features/data")
    assert(factory.count() == whole.count())
    val cols = whole.columns.sorted.map(col)
    val a = whole.select(cols: _*).orderBy(cols: _*).collect()
    val b = factory.select(cols: _*).orderBy(cols: _*).collect()
    assert(a.sameElements(b), "per-bucket factory output differs from single-job output")

    // metrics + lineage recorded per bucket
    val metrics = Files.readAllLines(
      java.nio.file.Paths.get(s"$work/features", "meta", "metrics.jsonl"))
    assert(metrics.size == 4)
    assert(snap.lineage.exists(_.contains("feature_factory bucket=3")))
  }
}
