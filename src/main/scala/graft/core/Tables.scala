package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata loader. Each table is one parquet file under the sf dir. */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
