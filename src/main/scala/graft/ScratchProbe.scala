package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate the cost of individual aggregates (not part of the
  * driver contract).
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val orders = Tables(spark, d, "orders")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def run(aggs: Seq[org.apache.spark.sql.Column]): Unit =
      orders.groupBy("o_orderpriority").agg(aggs.head, aggs.tail: _*)
        .write.format("noop").mode("overwrite").save()

    val cases: Seq[(String, Seq[org.apache.spark.sql.Column])] = Seq(
      "countDistinct" -> Seq(countDistinct(col("o_custkey")).as("a")),
      "hll rsd=0.01" -> Seq(approx_count_distinct(col("o_custkey"), 0.01).as("a")),
      "hll rsd=0.02" -> Seq(approx_count_distinct(col("o_custkey"), 0.02).as("a")),
      "hll default" -> Seq(approx_count_distinct(col("o_custkey")).as("a")),
      "percentile exact" -> Seq(expr("percentile(o_totalprice, 0.5)").as("a")),
      "approx_pct 10000" -> Seq(expr("approx_percentile(o_totalprice, 0.5, 10000)").as("a")),
      "approx_pct 1000" -> Seq(expr("approx_percentile(o_totalprice, 0.5, 1000)").as("a")),
      "cd + hll01" -> Seq(countDistinct(col("o_custkey")).as("a"),
        approx_count_distinct(col("o_custkey"), 0.01).as("b")),
      "cd + hll01 + pct + apct" -> Seq(countDistinct(col("o_custkey")).as("a"),
        approx_count_distinct(col("o_custkey"), 0.01).as("b"),
        expr("percentile(o_totalprice, 0.5)").as("c"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("e")))
    cases.foreach { case (n, a) => run(a) } // warmup
    cases.foreach { case (n, a) => time(n)(run(a)) }
    spark.stop()
  }
}
