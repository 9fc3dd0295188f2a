package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.functions.SimilarityOps.{dot, norm}
    import graft.functions.VectorExpressions.{vectorDot, vectorNorm}

    val emb = Tables(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val probes = emb.limit(50)
      .select(col("vec_id").as("p_id"), col("emb").as("p_emb"))

    def knn(dotF: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column, normF: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column) = {
      val e = emb.withColumn("nrm", normF(col("emb")))
      val p = probes.join(e.select(col("vec_id").as("p_id"),
        col("nrm").as("p_nrm")), "p_id")
      val w = Window.partitionBy("p_id").orderBy(col("cos").desc, col("n_id").asc)
      e.crossJoin(broadcast(p))
        .filter(col("vec_id") =!= col("p_id"))
        .select(col("p_id"), col("vec_id").as("n_id"),
          (dotF(col("p_emb"), col("emb")) / (col("p_nrm") * col("nrm"))).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
    }

    // warmup both
    noop(knn(dot, norm)); noop(knn(vectorDot, vectorNorm))
    time("knn 50-probe HOF")(noop(knn(dot, norm)))
    time("knn 50-probe native")(noop(knn(vectorDot, vectorNorm)))
    time("knn 50-probe HOF (2)")(noop(knn(dot, norm)))
    time("knn 50-probe native (2)")(noop(knn(vectorDot, vectorNorm)))

    // bit-identical check
    val a = knn(dot, norm).select("p_id", "n_id", "cos")
    val b = knn(vectorDot, vectorNorm).select("p_id", "n_id", "cos")
    println("diff rows: " + a.exceptAll(b).count() + " / " + b.exceptAll(a).count())
    spark.stop()
  }
}
