package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop smoke: runs the flagship entry() (t1 twin) and prints row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY rows=${df.count()} cols=${df.columns.mkString(",")}")
    df.show(3)
    spark.stop()
  }
}
