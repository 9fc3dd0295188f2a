package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Exercises the stop-block guards of the three blocked near-dup scorers
  * (VERDICT r4: uncapped quadratic blocks were the last at-scale defect
  * class) on DEGENERATE corpora — the skewed inputs the guards exist for,
  * which the driver's well-mixed synthetic tables never produce. The sf0.01
  * t2 hash gates the guards' cross-engine equivalence (the caps are mirrored
  * in each oracle); these tests pin the BOUND itself: a pathological block
  * must be dropped, not joined.
  */
class DedupGuardSpec extends SparkSpec {

  private def freshDir() = Files.createTempDirectory("graft-guard-").toString

  test("q_dedup_embed: a single-sign corpus collapses to one bucket at BOTH " +
      "levels and is dropped by the refined-bucket guard") {
    val dir = freshDir()
    import spark.implicits._
    // all dims positive → every vector lands in 6-bit bucket 63 AND 12-bit
    // bucket 4095: refinement cannot split it, the hard drop must fire
    (0 until 40).map(i =>
        (i.toLong, Array.tabulate(64)(j => 1.0f + i * 0.01f + j * 0.001f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_dedup_embed")(spark, dir)
    assert(out.count() == 0) // 40² in-bucket pairs never form
  }

  test("q_dedup_embed: a hot-but-splittable bucket refines instead of dropping") {
    val dir = freshDir()
    import spark.implicits._
    // 20 vectors share the first-6-dim signs (one hot 6-bit bucket) but
    // differ in dims 7-12 → refinement splits them into 12-bit sub-buckets
    // of 2; every vector keeps a neighbor, nothing is dropped
    (0 until 20).map { i =>
      val sub = i / 2 // pair index 0..9: ten distinct dim-7..12 sign patterns
      (i.toLong, Array.tabulate(64) { j =>
        if (j < 6) 1.0f + i * 0.01f
        else if (j < 12) (if (((sub >> (j - 6)) & 1) == 1) 1.0f else -1.0f)
        else 0.5f + i * 0.001f
      }, 0)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_dedup_embed")(spark, dir)
    assert(out.count() == 20, out.count()) // every vector reports its pair-mate
    // and every emitted bucket is a REFINED key (disjoint +64 key space)
    assert(out.filter(col("bucket") < 64).count() == 0)
  }

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
  }

  test("q_text_levenshtein: a Zipfian hot prefix block is dropped, cool blocks score") {
    val dir = freshDir()
    // 30 docs open with the stop-prefix "it is" (block size 30 > cap 3);
    // 3 docs share the discriminative prefix "zq wv" (≤ cap)
    writeDocs(dir,
      (0 until 30).map(i => (i.toLong, s"it is document number $i padding")) ++
        (0 until 3).map(i => (100L + i, s"zq wv document number $i padding")))
    val out = SparkEntry.queries("q_text_levenshtein")(spark, dir)
    assert(out.count() == 3, out.count()) // C(3,2) from the cool block only
    assert(out.filter(col("doc_a") < 100).count() == 0) // no hot-block pair
  }

  test("q_dedup_ngram_jaccard: same stop-block guard on the shingle prefix join") {
    val dir = freshDir()
    writeDocs(dir,
      (0 until 30).map(i => (i.toLong, s"it is document number $i padding")) ++
        (0 until 3).map(i => (100L + i, s"zq wv document number $i padding")))
    val out = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, dir)
    assert(out.count() == 3, out.count())
    assert(out.filter(col("doc_a") < 100).count() == 0)
  }

  test("MinHash LSH recall gauge: every exact-dup truth pair shares a band; " +
      "J>=0.5 truth recall measured against brute force") {
    // The LSH quality number the SemDeDup gauge provides for clustering,
    // here for the banding scheme itself: truth = brute-force shingle-set
    // Jaccard (shared-shingle join — never doc×doc), candidates = pairs
    // sharing >=1 of the 2 bands. J=1 pairs MUST collide (identical
    // signatures — deterministic); probabilistic pairs are gauged, not
    // promised: with 2 bands x 2 rows, P(candidate | J) = 1-(1-J^2)^2.
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(operators.DedupOps.shingles(col("toks")))).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
    val truth = inter
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sza")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("szb")), "db")
      .withColumn("j",
        col("inter") / (col("sza") + col("szb") - col("inter")))
      .filter(col("j") >= 0.5)
      .select("da", "db", "j")
      .cache()
    val bands = docs.select(col("doc_id"),
        explode(graft.functions.VectorExpressions.minhashBands(col("toks")))
          .as("band"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
      .distinct()
    val exact = truth.filter(col("j") >= 0.9999)
    val nExact = exact.count()
    val nExactCaught = exact.join(cand, Seq("da", "db"), "left_semi").count()
    val nTruth = truth.count()
    val nCaught = truth.join(cand, Seq("da", "db"), "left_semi").count()
    truth.unpersist()
    info(s"truth pairs J>=0.5: $nTruth, caught: $nCaught; " +
      s"exact pairs: $nExact, caught: $nExactCaught")
    assert(nTruth > 0, "corpus has no J>=0.5 truth pairs to gauge")
    // identical shingle sets => identical signatures, collision guaranteed;
    // vacuous when the corpus has no exact pairs (sf0.001 has none — its
    // near-dups are paraphrase-grade, measured J 0.5-0.95)
    assert(nExactCaught == nExact,
      s"an exact duplicate escaped LSH: $nExactCaught/$nExact")
    // measured 28/28 at sf0.001 — the floor leaves room for an unlucky
    // banding draw on a regenerated corpus, not for a broken kernel
    assert(nCaught >= (nTruth * 0.7).toLong,
      s"LSH recall below 0.7 on J>=0.5 truth: $nCaught/$nTruth")
  }

  test("q_dedup_lsh_tune: the b×r S-curve is monotone — more/shorter bands " +
      "never lose candidates or recall") {
    // theory: collision prob 1−(1−s^r)^b is pointwise ≥ for b4r1 vs b2r2 vs
    // b1r4 (any b1r4 collision is a b2r2 collision is a b4r1 collision,
    // because equal concatenations force equal slices). The sweep must
    // reproduce that dominance on real data, not just in the formula.
    val rows = SparkEntry.queries("q_dedup_lsh_tune")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val (c4, f4, r4) = rows("b4r1")
    val (c2, f2, r2) = rows("b2r2")
    val (c1, f1, r1) = rows("b1r4")
    assert(c4 >= c2 && c2 >= c1, s"candidate counts not monotone: $c4/$c2/$c1")
    assert(f4 >= f2 && f2 >= f1, s"found counts not monotone: $f4/$f2/$f1")
    assert(r4 >= r2 && r2 >= r1, s"recall not monotone: $r4/$r2/$r1")
  }
}
