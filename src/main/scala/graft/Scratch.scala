package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

    val tokens = split(lower(col("text")), " ")
    val shingles = transform(sequence(lit(1), greatest(size(tokens) - 2, lit(1))),
      i => concat_ws(" ", slice(tokens, i, lit(3))))

    val docs = Tables(spark, d, "documents").select(
      col("doc_id"),
      concat_ws(" ", slice(tokens, 1, 2)).as("pre"),
      array_distinct(shingles).as("sh"))

    // warmup
    noop(docs); noop(docs)
    time("shingle projection")(noop(docs))
    val a = docs.select(col("doc_id").as("doc_a"), col("pre"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("pre").as("pre_b"),
      col("sh").as("sh_b"))
    val joined = a.join(b, col("pre") === col("pre_b") && col("doc_a") < col("doc_b"))
    time("join, count only")(noop(joined.select("doc_a", "doc_b")))
    time("join + intersect")(noop(joined.select(col("doc_a"), col("doc_b"),
      size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"))))
    val full = SparkEntry.queries("q_dedup_ngram_jaccard")
    time("full query (warm)")(noop(full(spark, d)))
    time("full query (warm2)")(noop(full(spark, d)))
    spark.stop()
  }
}
