package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.KafkaShaped

/** Flagship pipeline (SURVEY.md §7 step 1): the reference's entire semantics,
  * Spark-natively, end to end — and genuinely through Structured Streaming:
  *
  *   events (sf0.001) staged as a file-source directory → readStream →
  *   Kafka-shaped record stream (O1) → six-type value schema (O4/O5) →
  *   partition routing (O8/O12) → foreachBatch → rotation-chunked,
  *   offset-named, idempotent ORC commit (O7/O9/O10/O11) → read-back (O13).
  *
  * Swapping the file source for a real broker is
  * `readStream.format("kafka")` — a config change (SURVEY.md §7 risk
  * register); no kafka jar exists in this zero-egress container.
  * Driver smoke-checks rows > 0 on the returned DataFrame.
  */
object Flagship {

  private val outDirs = new ConcurrentHashMap[String, String]()

  def run(spark: SparkSession, sfDir: String, flushSize: Long = 250): DataFrame = {
    val topicDir = outDirs.computeIfAbsent(s"$sfDir|$flushSize", _ => {
      // stage the single-file table as a streaming source directory
      val src = Files.createTempDirectory("graft-flagship-src-")
      Files.copy(Paths.get(s"$sfDir/events.parquet"),
        src.resolve("events.parquet"))
      val out = Files.createTempDirectory("graft-flagship-").toString
      StreamOps.runPipelineBlocking(spark, src.toString, out, flushSize)
      s"$out/topics/${KafkaShaped.topic}"
    })
    OffsetNamedOrcSink.read(spark, topicDir)
  }
}
