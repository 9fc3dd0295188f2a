package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only feature probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Does a pathGlobFilter-ed (streaming-style) InMemoryFileIndex still
    // infer partition columns from a `_chunk=` staging dir whose files are
    // all filtered out? (sink-as-source CONFLICTING_PARTITION_COLUMN_NAMES)
    val base = java.nio.file.Files.createTempDirectory("graft-probe-").toString
    Seq((1L, "a")).toDF("offset", "v").write.orc(s"$base/partition=0")
    // rename the committed file to the offset-name shape
    val dir = new java.io.File(s"$base/partition=0")
    dir.listFiles.filter(f => f.getName.endsWith(".orc")).zipWithIndex.foreach {
      case (f, _) => f.renameTo(new java.io.File(dir, "events+0+0000000000.orc"))
    }
    // plant a staging dir with a part- file
    Seq((2L, "b")).toDF("offset", "v").write.orc(s"$base/partition=0/_chunk=250")

    def attempt(label: String)(f: => Long): Unit =
      try println(s"$label ok rows=" + f)
      catch { case t: Throwable => println(s"$label FAIL: " + t.getMessage.take(200)) }

    attempt("BATCH-noglob") {
      spark.read.option("basePath", base).orc(s"$base/partition=*").count()
    }
    attempt("BATCH-glob") {
      spark.read.option("basePath", base)
        .option("pathGlobFilter", "*+*+*.orc").orc(s"$base/partition=*").count()
    }
    attempt("STREAM-glob") {
      val q = spark.readStream
        .schema("offset long, v string, partition int")
        .option("basePath", base)
        .option("pathGlobFilter", "*+*+*.orc")
        .orc(s"$base/partition=*")
        .writeStream.format("memory").queryName("probe_tail")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-probe-ck-").toString)
        .start()
      q.processAllAvailable(); q.stop()
      spark.table("probe_tail").count()
    }
    spark.stop()
  }
}
