package graft

import org.apache.spark.sql.SparkSession

/** Dev-only feature probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    Tables(spark, d, "customer").createOrReplaceTempView("customer")
    Tables(spark, d, "orders").createOrReplaceTempView("orders")
    // 1. lateral join with ORDER BY + LIMIT
    try {
      val r = spark.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
           FROM customer c,
           LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                    WHERE o_custkey = c.c_custkey
                    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
           ORDER BY c_custkey, o_orderkey""")
      println("LATERAL ok rows=" + r.count())
    } catch { case t: Throwable => println("LATERAL FAIL: " + t.getMessage.take(300)) }
    // 2. correlated scalar subquery in SELECT list
    try {
      val r = spark.sql(
        """SELECT c_custkey,
                  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n
           FROM customer c ORDER BY c_custkey""")
      println("SCALAR-SUBQ ok rows=" + r.count())
    } catch { case t: Throwable => println("SCALAR-SUBQ FAIL: " + t.getMessage.take(300)) }
    spark.stop()
  }
}
