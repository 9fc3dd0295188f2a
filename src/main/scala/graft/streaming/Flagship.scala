package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.KafkaShaped

/** Flagship pipeline (SURVEY.md §7 step 1): the reference's entire semantics,
  * Spark-natively, end to end —
  *
  *   events (sf0.001) → Kafka-shaped record stream (O1) → six-type value
  *   schema (O4/O5) → partition routing (O8/O12) → rotation-chunked,
  *   offset-named, idempotent ORC commit (O9/O10/O11) → read-back (O13).
  *
  * Driver smoke-checks rows > 0 on the returned DataFrame.
  */
object Flagship {

  private val outDirs = new ConcurrentHashMap[String, String]()

  def run(spark: SparkSession, sfDir: String, flushSize: Long = 250): DataFrame = {
    val topicDir = outDirs.computeIfAbsent(sfDir, _ => {
      val out = Files.createTempDirectory("graft-flagship-").toString
      val shaped = KafkaShaped.fromEvents(spark, sfDir)
      OffsetNamedOrcSink.write(shaped, out, flushSize)
    })
    OffsetNamedOrcSink.read(spark, topicDir)
  }
}
