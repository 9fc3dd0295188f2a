package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.3): invariants of the pipeline semantics
  * over random six-type rows, not fixtures.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic forAll over fixed seeds (scalatest-scalacheck bridge is
    * not on the offline classpath; each check spins Spark jobs anyway, so a
    * few seeded samples is the right cost/coverage point).
    */
  private def forAllSeeded[A](gen: Gen[A], seeds: Long*)(check: A => Unit): Unit =
    seeds.foreach { sd =>
      check(gen.pureApply(Gen.Parameters.default, Seed(sd)))
    }

  private val sixTypeSchema = StructType(Seq(
    StructField("b", BooleanType), StructField("i", IntegerType),
    StructField("l", LongType), StructField("f", FloatType),
    StructField("d", DoubleType), StructField("s", StringType)))

  private val rowGen: Gen[Row] = for {
    b <- Gen.option(Gen.oneOf(true, false))
    i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    l <- Gen.option(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    f <- Gen.option(Gen.chooseNum(-1e30f, 1e30f))
    d <- Gen.option(Gen.chooseNum(-1e300, 1e300))
    s <- Gen.option(Gen.asciiPrintableStr.map(_.take(50)))
  } yield Row(b.orNull, i.orNull, l.orNull, f.orNull, d.orNull, s.orNull)

  test("ORC write∘read is the identity on random six-type rows (incl. nulls)") {
    forAllSeeded(Gen.listOfN(40, rowGen), 42L, 7L, 2024L) { rows =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), sixTypeSchema)
      val dir = Files.createTempDirectory("graft-prop-orc-").toString
      df.write.mode("overwrite").orc(dir)
      val back = spark.read.orc(dir)
      assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
    }
  }

  test("exact dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val dedup = SparkEntry.queries("q_dedup_exact")
    val once = dedup(spark, sf)
    // feeding the deduped set through the same latest-wins logic changes nothing
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("event_id").desc)
    val twice = once.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(twice.exceptAll(once).count() == 0 && once.exceptAll(twice).count() == 0)
  }

  test("rotation invariant: chunk row counts sum to input; bounds inside chunk") {
    forAllSeeded(Gen.oneOf(100L, 250L, 333L, 1000L), 1L, 2L, 3L) { flush =>
      val events = Tables(spark, sf, "events")
      val chunks = events
        .groupBy((col("event_id") - pmod(col("event_id"), lit(flush))).as("chunk"))
        .agg(count(lit(1)).as("n"), min("event_id").as("lo"), max("event_id").as("hi"))
      val total = chunks.agg(sum("n")).head.getLong(0)
      assert(total == events.count())
      val bad = chunks.filter(col("lo") < col("chunk") ||
        col("hi") >= col("chunk") + flush).count()
      assert(bad == 0)
    }
  }

  test("minhash containment: identical docs share every band key") {
    // duplicate the documents table against itself — every doc's band keys
    // must equal its copy's (pure function of text)
    val mh = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("doc_id", "b0", "b1")
    val again = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select(col("doc_id"), col("b0").as("b0_2"), col("b1").as("b1_2"))
    val joined = mh.join(again, "doc_id")
    assert(joined.filter(col("b0") =!= col("b0_2") || col("b1") =!= col("b1_2"))
      .count() == 0)
  }
}
