package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offset-named, rotation-chunked, idempotent ORC sink — the one piece of the
  * reference that Spark's file sink does not provide (SURVEY.md §4
  * "Conclusion"): Spark invents opaque part-file names, while the reference
  * commits deterministic keys
  * `topics/<topic>/partition=<p>/<topic>+<p>+<%010d startOffset>.orc`
  * (`FileUtils.java:10-26`, pad format `DataWriterOrcTest.java:38`, delims
  * `TestWithMockedS3.java:40-41`; `#`→`_` sanitizer `OrcRecordWriter.java:50`
  * — we use `+` directly, the production delimiter).
  *
  * Design for scale:
  *  - rotation (flush.size, reference O9) = offset-range chunking, computed
  *    as a column, so the whole write stays distributed;
  *  - `repartition(partition, chunk)` co-locates each output file's rows in
  *    one task → exactly one ORC file per (partition, chunk), written in
  *    parallel across the cluster;
  *  - `partitionBy(partition, chunk)` + dynamic partition overwrite makes
  *    re-processing an offset range idempotent (reference O11's
  *    `overwrite(true)` recovery contract, `DataWriterOrcTest.java:102-124`);
  *  - the rename to reference-style names is a driver-side, metadata-only
  *    pass (one FS rename per committed file — O(#files), never O(#rows)).
  */
object OffsetNamedOrcSink {

  val ChunkCol = "_chunk"

  /** Write a Kafka-shaped DataFrame (key, value:struct, topic, partition,
    * offset, timestamp) as offset-named ORC files. Returns the topic dir.
    *
    * Chunk-spanning batches: a rotation chunk only partially covered by this
    * batch may already hold rows from an earlier batch (micro-batch
    * boundaries are not flush-size-aligned). Dynamic overwrite would delete
    * those rows, so the touched chunks' existing rows are read back (the
    * (partition, chunk) filter prunes to exactly those directories), unioned
    * in, and deduped by offset — replay-safe AND batch-boundary-safe. Cost
    * is O(touched chunks × flushSize), never O(output).
    */
  def write(df: DataFrame, outDir: String, flushSize: Long,
      topic: String = "events"): String = {
    require(flushSize > 0, "flush.size must be positive")
    val spark = df.sparkSession
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")

    val topicDir = s"$outDir/topics/$topic"
    // start offset of the file this record rotates into (O9/O10)
    val chunk = (col("offset") - pmod(col("offset"), lit(flushSize)))
    val flat = df
      .withColumn(ChunkCol, chunk)
      .select(col("partition"), col(ChunkCol), col("offset"),
        col("value.*"))
    val fs = FileSystem.get(new java.net.URI(topicDir),
      spark.sparkContext.hadoopConfiguration)
    val merged = if (fs.exists(new Path(topicDir))) {
      val touched = flat.select(col("partition"), col(ChunkCol)).distinct()
      val existing = spark.read.orc(topicDir)
        .join(broadcast(touched), Seq("partition", ChunkCol), "left_semi")
        // partition-dir columns read back as inferred ints — realign types
        .select(flat.schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
      // offsets are unique only per partition (Kafka contract) — a global
      // offset dedup would drop same-offset rows across partitions
      flat.union(existing).dropDuplicates("partition", "offset")
    } else flat
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      merged
        .repartition(col("partition"), col(ChunkCol))
        .sortWithinPartitions(col("offset"))
        .write.mode("overwrite")
        .partitionBy("partition", ChunkCol)
        .orc(topicDir)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    renameToOffsetNames(spark, topicDir, topic)
    topicDir
  }

  /** Rename Spark's part-* files to `<topic>+<partition>+<%010d offset>.orc`.
    * Metadata-only: one rename per committed file.
    */
  private def renameToOffsetNames(spark: org.apache.spark.sql.SparkSession,
      topicDir: String, topic: String): Unit = {
    val fs = FileSystem.get(new java.net.URI(topicDir),
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(topicDir)
    if (!fs.exists(root)) return
    for {
      pDir <- fs.listStatus(root).toSeq if pDir.isDirectory
      pName = pDir.getPath.getName if pName.startsWith("partition=")
      cDir <- fs.listStatus(pDir.getPath).toSeq if cDir.isDirectory
      cName = cDir.getPath.getName if cName.startsWith(s"$ChunkCol=")
    } {
      val p = pName.stripPrefix("partition=")
      val startOffset = cName.stripPrefix(s"$ChunkCol=").toLong
      val target = new Path(cDir.getPath, f"$topic+$p+$startOffset%010d.orc")
      val parts = fs.listStatus(cDir.getPath).toSeq
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      parts.zipWithIndex.foreach { case (f, i) =>
        // normally exactly one part per chunk (repartition above); suffix
        // defensively if a chunk ever spans writers
        val t = if (i == 0) target
          else new Path(cDir.getPath, f"$topic+$p+$startOffset%010d-$i.orc")
        if (fs.exists(t)) fs.delete(t, false)
        fs.rename(f.getPath, t)
      }
    }
  }

  /** Read the sink's output back (reference O13 / EP3 verification path).
    * Partition-dir columns (partition, _chunk) come back as inferred ints.
    */
  def read(spark: org.apache.spark.sql.SparkSession, topicDir: String): DataFrame =
    spark.read.orc(topicDir)
}
