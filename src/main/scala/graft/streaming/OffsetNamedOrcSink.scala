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
  * — we use `+` directly, the production delimiter). Final layout matches the
  * reference exactly: offset-named files directly under `partition=<p>/`.
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
  *
  * All writes against one topic dir must use the same flushSize (the chunk
  * of an existing row is recomputed from its offset during merges).
  */
object OffsetNamedOrcSink {

  val ChunkCol = "_chunk"

  /** Write a Kafka-shaped DataFrame (key, value:struct, topic, partition,
    * offset, timestamp) as offset-named ORC files. Returns the topic dir.
    *
    * Chunk-spanning batches: a rotation chunk only partially covered by this
    * batch may already hold rows from an earlier batch (micro-batch
    * boundaries are not flush-size-aligned). Dynamic overwrite would delete
    * those rows, so the touched chunks' existing files — located exactly, by
    * their deterministic names — are read back, eagerly MATERIALIZED
    * (`localCheckpoint`), unioned in, and deduped by offset. Replay-safe AND
    * batch-boundary-safe, and the write job never scans the directory it is
    * about to overwrite (no dependence on the V1 path-check loophole). Cost
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
      // RECOVERY: a crash between a committed overwrite and the rename pass
      // leaves merged rows inside `_chunk=` staging dirs (possibly with the
      // superseded committed file already deleted). Re-running the rename
      // pass first hoists those to committed names — it only ever sees
      // job-committed part files (in-flight writes live under
      // .spark-staging), and hoisted data is by construction a dedup-safe
      // superset of what it replaces — so the name-based listing below is
      // complete again. Steady state: no _chunk dirs, metadata-only no-op.
      renameToOffsetNames(spark, topicDir, topic)
      // touched (partition, chunk) pairs — small by construction: one per
      // output file of this batch. Their existing files have deterministic
      // names, so the read-back lists exactly those files (one listing per
      // touched partition, never a scan of the whole topic dir).
      val touched = flat.select(col("partition").cast("int"),
        col(ChunkCol).cast("long")).distinct()
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      val existingPaths = touched.groupBy(_._1).toSeq.flatMap { case (p, pcs) =>
        val pDir = new Path(s"$topicDir/partition=$p")
        if (fs.exists(pDir)) {
          val prefixes = pcs.map { case (_, c) => f"$topic+$p+$c%010d" }
          fs.listStatus(pDir).toSeq.filter(f => f.isFile &&
            f.getPath.getName.endsWith(".orc") &&
            prefixes.exists(f.getPath.getName.startsWith))
            .map(_.getPath.toString)
        } else Nil
      }
      if (existingPaths.isEmpty) flat
      else {
        val existing = spark.read.option("basePath", topicDir)
          .orc(existingPaths: _*)
          .withColumn(ChunkCol,
            col("offset") - pmod(col("offset"), lit(flushSize)))
          // partition-dir column reads back as inferred int — realign types
          .select(flat.schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
          // materialize NOW: after this the write job holds the old rows in
          // memory and never reads under topicDir (ADVICE r1: dynamic
          // overwrite must not scan its own output path)
          .localCheckpoint(true)
        // offsets are unique only per partition (Kafka contract) — a global
        // offset dedup would drop same-offset rows across partitions
        flat.union(existing).dropDuplicates("partition", "offset")
      }
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

  /** Rename Spark's part-* files to `<topic>+<partition>+<%010d offset>.orc`
    * and hoist them from the transient `_chunk=` dirs up into `partition=<p>/`
    * — the reference's exact key layout (`FileUtils.fileKeyToCommit`).
    * Metadata-only: one rename per committed file. Stale files for a
    * rewritten chunk are deleted first, so replays converge to one file per
    * chunk.
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
      val prefix = f"$topic+$p+$startOffset%010d"
      val parts = fs.listStatus(cDir.getPath).toSeq
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      // a part-less _chunk dir means a crash landed between this chunk's
      // renames and its dir delete — the committed files ARE the data;
      // touching them here would destroy the only copy
      if (parts.nonEmpty) {
        // this chunk was just rewritten: clear any previously committed
        // files for it (incl. defensive -N suffixes) before moving the new
        // ones up
        fs.listStatus(pDir.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.startsWith(prefix))
          .foreach(f => fs.delete(f.getPath, false))
        parts.zipWithIndex.foreach { case (f, i) =>
          // normally exactly one part per chunk (repartition above); suffix
          // defensively if a chunk ever spans writers
          val t = if (i == 0) new Path(pDir.getPath, s"$prefix.orc")
            else new Path(pDir.getPath, s"$prefix-$i.orc")
          fs.rename(f.getPath, t)
        }
      }
      fs.delete(cDir.getPath, true) // now holds only commit markers, if that
    }
  }

  /** Read the sink's output back (reference O13 / EP3 verification path).
    * `partition` comes from the directory; `_chunk` is recovered from the
    * offset embedded in each file's name.
    */
  def read(spark: org.apache.spark.sql.SparkSession, topicDir: String): DataFrame =
    spark.read.orc(topicDir)
      .withColumn(ChunkCol,
        regexp_extract(input_file_name(), raw"\+(\d+)(?:-\d+)?\.orc$$", 1)
          .cast("long"))
}
