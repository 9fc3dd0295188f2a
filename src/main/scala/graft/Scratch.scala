package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val names = if (args.isEmpty) Seq("q_dedup_components") else args.toSeq
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      noop(fn(spark, d)) // warmup
      time(n)(noop(fn(spark, d)))
      time(n + " (2)")(noop(fn(spark, d)))
    }
    spark.stop()
  }
}
