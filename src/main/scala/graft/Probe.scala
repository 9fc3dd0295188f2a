package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only feature probe (not part of the driver contract). Records the
  * experiments behind two non-obvious invariants (CLAUDE.md):
  *  1. `_`-prefixed dirs whose names contain `=` are NOT hidden from file
  *     listings — partition inference parses them, so a staging dir visible
  *     to any listing (batch or streaming, pathGlobFilter or not) dies with
  *     CONFLICTING_PARTITION_COLUMN_NAMES. streamFromSink therefore needs
  *     recursiveFileLookup + the committed-name filter.
  *  2. Plain `explode` triggers InferFiltersFromGenerate, which pushes
  *     `size(e)>0 AND isnotnull(e)` below the projections with the WHOLE
  *     exploded expression inlined — a lambda inside it (shingle transform)
  *     then re-evaluates split() per element inside the filter: measured
  *     9-12 s vs ~1.5 s at sf0.1 for q_decontaminate. explode_outer skips
  *     the rule.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def attempt(label: String)(f: => Long): Unit =
      try println(s"$label ok rows=" + f)
      catch { case t: Throwable => println(s"$label FAIL: " + t.getMessage.take(200)) }

    // -- experiment 1: '=' exempts underscore dirs from listing filters ----
    val base = java.nio.file.Files.createTempDirectory("graft-probe-").toString
    Seq((1L, "a")).toDF("offset", "v").write.orc(s"$base/partition=0")
    val dir = new java.io.File(s"$base/partition=0")
    dir.listFiles.filter(_.getName.endsWith(".orc")).foreach(
      _.renameTo(new java.io.File(dir, "events+0+0000000000.orc")))
    Seq((2L, "b")).toDF("offset", "v").write.orc(s"$base/partition=0/_chunk=250")
    attempt("BATCH-staging-visible") {
      spark.read.option("basePath", base).orc(s"$base/partition=*").count()
    }
    attempt("BATCH-glob-still-conflicts") {
      spark.read.option("basePath", base)
        .option("pathGlobFilter", "*+*+*.orc").orc(s"$base/partition=*").count()
    }
    attempt("RECURSIVE-lookup-ok") {
      spark.read.schema("offset long, v string")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*+*+*.orc").orc(base).count()
    }

    // -- experiment 2: InferFiltersFromGenerate inlines the exploded expr --
    import graft.operators.DedupOps
    val d = "/root/testdata/sf0.01"
    val docs = Tables(spark, d, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"), DedupOps.shingleHashes.as("sh"))
    def timeIt(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    val inner = docs.select(explode(col("sh")))
    println("inferred filter present: " +
      inner.queryExecution.optimizedPlan.toString.contains("Filter"))
    timeIt("explode (inferred filter inlines lambda)")(inner.count())
    timeIt("explode_outer (no inferred filter)")(
      docs.select(explode_outer(col("sh"))).count())
    spark.stop()
  }
}
