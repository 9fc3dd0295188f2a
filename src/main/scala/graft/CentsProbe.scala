package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump the round()-based cents quantization per row so the
  * fuzz harness can assert full-column cross-engine parity (the DuckDB
  * twin is CAST(round(x * 100) AS BIGINT) in tools/fuzz_oracles.py).
  * Args: sfDir outDir.
  */
object CentsProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, sfDir, "events")
      .select(col("event_id"),
        round(col("value") * lit(100.0)).cast("long").as("cents"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/events_cents")
    Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * lit(100.0)).cast("long").as("cents"),
        (round(col("l_extendedprice") * lit(100.0)) * 1000).cast("long")
          .as("c5"),
        round(col("l_discount") * lit(100.0)).cast("long").as("disc"),
        round(col("l_tax") * lit(100.0)).cast("long").as("tax"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/li_cents")
    spark.stop()
  }
}
