package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.KafkaShaped
import graft.streaming.OffsetNamedOrcSink

/** Pins the reference's pipeline contract (SURVEY.md §2.1 O8–O13) on the
  * offset-named ORC sink, with *distinct* per-row values — the reference's
  * own tests used identical records, which masked its vector[0] read bugs
  * (`OrcUtils.java:63-80`); ours would catch that class of bug.
  */
class OffsetNamedOrcSinkSpec extends SparkSpec {

  private def freshOut() = Files.createTempDirectory("graft-sink-test-").toString

  private lazy val shaped = KafkaShaped.fromEvents(spark, sf) // 1000 events

  /** Reference layout (`FileUtils.fileKeyToCommit`): offset-named files sit
    * DIRECTLY under `partition=<p>/` — no other directory level.
    */
  private def orcFiles(topicDir: String) =
    new java.io.File(topicDir).listFiles.filter(_.isDirectory)
      .filter(_.getName.startsWith("partition="))
      .flatMap(_.listFiles).filter(_.isFile)
      .filter(_.getName.endsWith(".orc"))

  test("O10: files are offset-named <topic>+<partition>+<%010d>.orc in partition dirs") {
    val out = freshOut()
    val topicDir = OffsetNamedOrcSink.write(shaped, out, flushSize = 250)
    val files = orcFiles(topicDir).map(_.getName)
    assert(files.nonEmpty)
    // every file matches events+<p>+<zero-padded offset>.orc
    val pat = raw"events\+\d+\+\d{10}\.orc".r
    assert(files.forall(f => pat.matches(f)), files.mkString(", "))
    // chunk starts are multiples of flushSize
    val offsets = files.map(_.split("\\+")(2)).map(_.stripSuffix(".orc").toLong)
    assert(offsets.forall(_ % 250 == 0))
  }

  test("O9: rotation — sum of file chunks equals input; ranges respect flush.size") {
    val out = freshOut()
    val topicDir = OffsetNamedOrcSink.write(shaped, out, flushSize = 250)
    val back = OffsetNamedOrcSink.read(spark, topicDir)
    assert(back.count() == 1000)
    // within each (partition, chunk), offsets lie in [chunk, chunk+250)
    val bad = back.filter(col("offset") < col(OffsetNamedOrcSink.ChunkCol) ||
      col("offset") >= col(OffsetNamedOrcSink.ChunkCol) + 250).count()
    assert(bad == 0)
  }

  test("O13: roundtrip preserves every distinct row value") {
    val out = freshOut()
    val topicDir = OffsetNamedOrcSink.write(shaped, out, flushSize = 250)
    val back = OffsetNamedOrcSink.read(spark, topicDir)
      .select(col("offset"), col("flag"), col("uid"), col("id"),
        col("fval"), col("dval"), col("etype"))
    val expected = shaped.select(col("offset"), col("value.flag"),
      col("value.uid"), col("value.id"), col("value.fval"), col("value.dval"),
      col("value.etype"))
    assert(back.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(back).count() == 0)
  }

  test("O11: rewriting the same offset range is idempotent (recovery contract)") {
    val out = freshOut()
    val first = OffsetNamedOrcSink.write(shaped, out, flushSize = 250)
    val c1 = OffsetNamedOrcSink.read(spark, first).count()
    // reprocess everything (at-least-once input) — same file set, same rows
    val second = OffsetNamedOrcSink.write(shaped, out, flushSize = 250)
    val c2 = OffsetNamedOrcSink.read(spark, second).count()
    assert(c1 == c2 && c1 == 1000)
    val files = orcFiles(first)
    // no -1 suffixed duplicates appeared on rewrite
    assert(files.forall(f => !f.getName.contains("-1.orc")), files.map(_.getName).mkString(","))
    // and no leftover _chunk= staging dirs below the partition dirs
    val stray = new java.io.File(first).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.isDirectory)
    assert(stray.isEmpty, stray.map(_.getName).mkString(","))
  }

  test("O8/O12: multi-partition routing is complete and disjoint") {
    val out = freshOut()
    val topicDir = OffsetNamedOrcSink.write(shaped, out, flushSize = 250)
    val back = OffsetNamedOrcSink.read(spark, topicDir)
    // partition dirs carry the key: partition == pmod(uid, 4) for every row
    val wrong = back.filter(pmod(col("uid"), lit(4)) =!= col("partition")).count()
    assert(wrong == 0)
    // all four routes present (uid distribution covers them at sf0.001)
    assert(back.select("partition").distinct().count() == 4)
  }

  test("chunk-spanning writes merge, not clobber (batch-boundary safety)") {
    val out = freshOut()
    // first write covers offsets [0, 437) — chunk 250 is partially filled
    val first = OffsetNamedOrcSink.write(
      shaped.filter(col("offset") < 437), out, flushSize = 250)
    assert(OffsetNamedOrcSink.read(spark, first).count() == 437)
    // second write covers [437, 1000) — touches chunk 250 again
    val second = OffsetNamedOrcSink.write(
      shaped.filter(col("offset") >= 437), out, flushSize = 250)
    val back = OffsetNamedOrcSink.read(spark, second)
    assert(back.count() == 1000)
    // the spanning chunk holds BOTH halves
    val chunk250 = back.filter(col(OffsetNamedOrcSink.ChunkCol) === 250)
    assert(chunk250.agg(min("offset"), max("offset")).head ===
      org.apache.spark.sql.Row(250L, 499L))
  }

  test("crash between stale-delete and rename is recovered (no row loss)") {
    val out = freshOut()
    // batch 1 lands offsets [0, 437); chunk 250 of partition 0 is committed
    OffsetNamedOrcSink.write(shaped.filter(col("offset") < 437), out, 250)
    // simulate the crash window of a follow-up write: the overwrite job
    // committed its _chunk staging dir and the rename pass already deleted
    // the superseded committed file, but died before the rename. The
    // staged part file holds (at least) the rows of the deleted file —
    // reconstruct exactly that state from the committed file itself.
    val pDir = new java.io.File(s"$out/topics/events/partition=0")
    val committed = pDir.listFiles.filter(_.getName.startsWith("events+0+0000000250"))
    assert(committed.length == 1)
    val staging = new java.io.File(pDir, "_chunk=250")
    assert(staging.mkdir())
    assert(committed.head.renameTo(new java.io.File(staging, "part-00000-crash.orc")))
    // next batch touches chunk 250 again — must merge the crashed rows back
    val topicDir = OffsetNamedOrcSink.write(
      shaped.filter(col("offset") >= 437), out, 250)
    val back = OffsetNamedOrcSink.read(spark, topicDir)
    assert(back.count() == 1000, s"rows: ${back.count()}")
    assert(back.select("offset").distinct().count() == 1000)
    assert(!staging.exists()) // staging dir cleaned up by the recovery pass
  }

  test("part-less _chunk dir (crash after renames) must not destroy committed files") {
    val out = freshOut()
    OffsetNamedOrcSink.write(shaped.filter(col("offset") < 437), out, 250)
    val pDir = new java.io.File(s"$out/topics/events/partition=0")
    // crash landed between a chunk's renames and its dir delete: the dir
    // remains but holds no part files — the committed files ARE the data
    assert(new java.io.File(pDir, "_chunk=250").mkdir())
    val topicDir = OffsetNamedOrcSink.write(
      shaped.filter(col("offset") >= 437), out, 250)
    val back = OffsetNamedOrcSink.read(spark, topicDir)
    assert(back.count() == 1000, s"rows: ${back.count()}")
  }

  test("O4/O5: six-type schema survives ORC with nulls intact") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType)))
    val rows = Seq(
      Row(true, 1, 10L, 1.5f, 2.5, "x"),
      Row(false, 2, 20L, -0.5f, 1e300, ""),
      Row(null, null, null, null, null, null)) // the reference NPEs here; we must not
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = freshOut()
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    assert(back.count() == 3)
    assert(back.filter(col("b").isNull && col("s").isNull).count() == 1)
  }
}
