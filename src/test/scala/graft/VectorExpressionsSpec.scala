package graft

import org.apache.spark.sql.functions._
import graft.functions.{SimilarityOps, VectorExpressions}

/** Native vector kernels: equality with the HOF reference implementation,
  * null handling, SQL registration, and codegen execution.
  */
class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("native dot/norm are bit-identical to the HOF formulation") {
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val both = emb.select(
      SimilarityOps.dot(col("e"), col("e")).as("nat"),
      SimilarityOps.dotHof(col("e"), col("e")).as("hof"),
      SimilarityOps.norm(col("e")).as("nat_n"),
      SimilarityOps.normHof(col("e")).as("hof_n"))
    assert(both.filter(col("nat") =!= col("hof") ||
      col("nat_n") =!= col("hof_n")).count() == 0)
  }

  test("null inputs yield null, not a crash") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0)), None)).toDF("a", "b")
    val out = df.select(
      VectorExpressions.vectorDot(col("a"), col("b")).as("d"),
      VectorExpressions.vectorNorm(col("a")).as("n")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
    assert(out(2).isNullAt(1) == false && out(1).isNullAt(1))
  }

  test("null ELEMENTS propagate to null, matching the HOF fold") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
      .select(col("a").cast("array<double>").as("a"),
        col("b").cast("array<double>").as("b"))
    val out = df.select(
      VectorExpressions.vectorDot(col("a"), col("b")).as("d"),
      VectorExpressions.vectorNorm(col("a")).as("n"),
      SimilarityOps.dotHof(col("a"), col("b")).as("d_hof")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getDouble(0) == 11.0 && out(1).getDouble(2) == 11.0)
  }

  test("length-mismatched arrays yield null, matching the zip_with pad") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(3.0, 4.0)),
      (Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val out = df.select(
      VectorExpressions.vectorDot(col("a"), col("b")).as("d"),
      SimilarityOps.dotHof(col("a"), col("b")).as("d_hof")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // ragged → null, both forms
    assert(out(1).getDouble(0) == 11.0 && out(1).getDouble(1) == 11.0)
  }

  test("non-nullable no-null-element input executes with codegen (nullable contract)") {
    // pre-fix, non-nullable children made ev.isNull a literal → broken
    // generated code → silent interpreter fallback. RDD-backed (a local
    // relation would be constant-folded away, leaving no codegen stage).
    // fallback=false + CODEGEN_ONLY make a Janino compile failure THROW
    // instead of silently interpreting — without them this test is vacuous.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a",
      ArrayType(DoubleType, containsNull = false), nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Seq(3.0, 4.0))), 1), schema)
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    val prevMode = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val out = df.select(
        VectorExpressions.vectorDot(col("a"), col("a")).as("d"),
        VectorExpressions.vectorNorm(col("a")).as("n"))
      assert(out.head == org.apache.spark.sql.Row(25.0, 5.0))
      assert(out.queryExecution.executedPlan.toString.contains("*("))
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevMode)
    }
  }

  test("SQL registration exposes graft_vector_dot / graft_vector_norm") {
    VectorExpressions.register(spark)
    val row = spark.sql(
      "SELECT graft_vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "graft_vector_norm(array(3.0d, 4.0d)) AS n").head
    assert(row.getDouble(0) == 11.0 && row.getDouble(1) == 5.0)
  }

  test("native SimHash16 is bit-identical to the 16-pass HOF fold") {
    import graft.operators.DedupOps
    val toks = split(lower(col("text")), " ")
    val vals = transform(toks, tk => DedupOps.hex4(tk))
    val total = size(col("vals")).cast("long")
    // the ORIGINAL 16-pass formulation, kept here as the reference impl
    val hofSim = (0 until 16).map { b =>
      val ones = aggregate(col("vals"), lit(0L),
        (acc, v) => acc + shiftright(v, b).bitwiseAND(lit(1L)))
      when(ones * 2 > total, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val both = Tables(spark, sf, "documents")
      .select(col("doc_id"), toks.as("toks"), vals.as("vals"))
      .select(col("doc_id"),
        VectorExpressions.simhash16(col("toks")).as("nat"),
        hofSim.as("hof"))
    assert(both.filter(col("nat") =!= col("hof") ||
      col("nat").isNull =!= col("hof").isNull).count() == 0)
    // edge cases: empty token array → 0; null element → null; null array → null
    val edge = Seq(
      (1L, Some(Seq[String]())),
      (2L, Some(Seq[String]("a", null))),
      (3L, None)).toDF("id", "toks")
      .select(col("id"), col("toks").cast("array<string>").as("toks"))
      .select(col("id"), VectorExpressions.simhash16(col("toks")).as("s"))
      .orderBy("id").collect()
    assert(edge(0).getLong(1) == 0L)
    assert(edge(1).isNullAt(1) && edge(2).isNullAt(1))
  }

  test("SQL registration exposes graft_simhash16 under CODEGEN_ONLY") {
    VectorExpressions.register(spark)
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    val prevMode = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      // md5('a') = 0cc175b9... → hash 0x0cc1; single token → every set bit wins
      val row = spark.sql("SELECT graft_simhash16(array('a')) AS s").head
      assert(row.getLong(0) == 0x0cc1L, row.getLong(0).toHexString)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevMode)
    }
  }

  test("native RollingFp is bit-identical to the transform+aggregate fold") {
    import graft.operators.DedupOps
    val toks = split(lower(col("text")), " ")
    val vals = transform(toks, tk => DedupOps.hex4(tk))
    val hofFp = aggregate(vals, lit(7L),
      (acc, v) => pmod(acc * 31 + v, lit(1000000007L)))
    val both = Tables(spark, sf, "documents")
      .select(VectorExpressions.rollfp(toks).as("nat"), hofFp.as("hof"))
    assert(both.filter(col("nat") =!= col("hof")).count() == 0)
    // empty array → the init value 7; null element / null array → null
    val edge = Seq(
      (1L, Some(Seq[String]())),
      (2L, Some(Seq[String]("a", null))),
      (3L, None)).toDF("id", "toks")
      .select(col("id"), col("toks").cast("array<string>").as("toks"))
      .select(col("id"), VectorExpressions.rollfp(col("toks")).as("f"))
      .orderBy("id").collect()
    assert(edge(0).getLong(1) == 7L)
    assert(edge(1).isNullAt(1) && edge(2).isNullAt(1))
  }

  test("native MinHashBands is bit-identical to the shingle→md5→array_min form") {
    import graft.operators.DedupOps
    val toks = split(lower(col("text")), " ")
    val mh = (0 until 4).map(k =>
      array_min(transform(col("hs"), h => substring(h, k * 8 + 1, 8))))
    val both = Tables(spark, sf, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        transform(DedupOps.shingles(col("toks")), x => md5(x)).as("hs"))
      .select(
        VectorExpressions.minhashBands(col("toks")).as("bands"),
        concat(mh(0), mh(1)).as("b0_hof"),
        concat(mh(2), mh(3)).as("b1_hof"))
    assert(both.filter(col("bands").getItem(0) =!= col("b0_hof") ||
      col("bands").getItem(1) =!= col("b1_hof")).count() == 0)
    // short docs (< 3 tokens) still produce one end-clamped shingle
    val short = Seq((1L, Seq("a")), (2L, Seq("a", "b"))).toDF("id", "toks")
      .select(VectorExpressions.minhashBands(col("toks")).as("bands")).collect()
    assert(short.forall(r => r.getSeq[String](0).forall(_.length == 16)))
  }

  test("MinHashBands digests raw token bytes (invalid UTF-8 survives un-mangled)") {
    // cast(binary AS string) copies raw bytes into an unvalidated UTF8String
    // — legal input the kernel must digest byte-identically to Spark's own
    // md5(). A java.lang.String round-trip would substitute U+FFFD.
    val bad = Array(0x61.toByte, 0xff.toByte, 0x62.toByte) // "a<invalid>b"
    val row = Seq(Tuple1(Array(bad))).toDF("bins")
      .select(transform(col("bins"), b => b.cast("string")).as("toks"))
      .select(
        VectorExpressions.minhashBands(col("toks")).as("bands"),
        md5(element_at(col("toks"), 1)).as("spark_md5"))
      .head
    val hex = row.getString(1) // Spark md5 of the raw bytes
    assert(row.getSeq[String](0) ==
      Seq(hex.substring(0, 16), hex.substring(16, 32)))
    val jvm = java.security.MessageDigest.getInstance("MD5").digest(bad)
      .map(b => f"$b%02x").mkString
    assert(hex == jvm) // and Spark's md5 digested the raw bytes too
  }

  test("null tokens: kernels null-poison where the HOF forms silently coerce") {
    import graft.operators.DedupOps
    // the HOF simhash turns the nulled per-bit aggregate into a 0 vote via
    // when/otherwise; the HOF shingle's concat_ws DROPS null tokens and
    // emits real band keys. Both would bucket corrupt input as if it were
    // clean — the kernels return null instead, and this divergence is a
    // deliberate contract (unreachable from split()-produced tokens).
    val vals = transform(col("toks"), tk => DedupOps.hex4(tk))
    val total = size(vals).cast("long")
    val hofSim = (0 until 16).map { b =>
      val ones = aggregate(vals, lit(0L),
        (acc, v) => acc + shiftright(v, b).bitwiseAND(lit(1L)))
      when(ones * 2 > total, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val mh = (0 until 4).map(k =>
      array_min(transform(col("hs"), h => substring(h, k * 8 + 1, 8))))
    val row = Seq(Tuple1(Seq[String]("a", null, "b"))).toDF("toks")
      .select(col("toks").cast("array<string>").as("toks"))
      .select(col("toks"),
        transform(DedupOps.shingles(col("toks")), x => md5(x)).as("hs"))
      .select(
        VectorExpressions.simhash16(col("toks")).as("sim_nat"), hofSim.as("sim_hof"),
        VectorExpressions.minhashBands(col("toks")).as("bands_nat"),
        concat(mh(0), mh(1)).as("b0_hof"))
      .head
    assert(row.isNullAt(0) && !row.isNullAt(1) && row.getLong(1) == 0L)
    assert(row.isNullAt(2) && !row.isNullAt(3) && row.getString(3).length == 16)
  }

  test("SortedIntersectCount matches size(array_intersect) on sorted rank arrays") {
    // the PPJoin verify contract: sorted, duplicate-free int arrays (token
    // ranks). Parity against the hash-based built-in on every doc pair of a
    // small slice, plus null-element and codegen checks.
    import graft.operators.DedupOps
    val docs = Tables(spark, sf, "documents").limit(40)
      .select(col("doc_id"),
        array_distinct(split(lower(col("text")), " ")).as("ts"))
    val tok = docs.select(col("doc_id"), explode(col("ts")).as("tok"))
    val rk = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("df").asc, col("tok").asc)))
      .select("tok", "rk")
    val ranked = tok.join(rk, "tok").groupBy("doc_id")
      .agg(sort_array(collect_list(col("rk"))).as("rts"))
    val pairs = ranked.select(col("doc_id").as("a"), col("rts").as("ra"))
      .crossJoin(ranked.select(col("doc_id").as("b"), col("rts").as("rb")))
      .filter(col("a") < col("b"))
      .select(
        VectorExpressions.sortedIntersectCount(col("ra"), col("rb")).as("nat"),
        size(array_intersect(col("ra"), col("rb"))).cast("long").as("ref"))
    assert(pairs.count() > 0)
    assert(pairs.filter(col("nat") =!= col("ref")).count() == 0)
    // null element → null; empty arrays → 0
    val edge = Seq(
      (Seq[java.lang.Integer](1, null, 5), Seq[java.lang.Integer](1, 5)),
      (Seq[java.lang.Integer](), Seq[java.lang.Integer](1)),
      (Seq[java.lang.Integer](1, 3, 5), Seq[java.lang.Integer](2, 3, 5, 9)))
      .toDF("a", "b")
      .select(col("a").cast("array<int>").as("a"),
        col("b").cast("array<int>").as("b"))
      .select(VectorExpressions.sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getLong(0) == 0L)
    assert(edge(2).getLong(0) == 2L)
    // SQL registration
    VectorExpressions.register(spark)
    assert(spark.sql("SELECT graft_sorted_intersect_count(array(1,2,4), array(2,3,4)) AS c")
      .head.getLong(0) == 2L)
  }

  test("LcsLength matches the HOF row-DP fold (the q_eval_rouge kernel)") {
    // parity on a real corpus slice: the kernel and the pure-HOF nested
    // fold evaluate the identical recurrence
    val docs = Tables(spark, sf, "documents").limit(60)
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .withColumn("cand", expr(
        """transform(sequence(2, size(toks)),
             i -> IF(pmod(i, 7) = 0, 'xx', element_at(toks, i)))"""))
    val both = docs.select(
      VectorExpressions.lcsLength(col("toks"), col("cand")).as("nat"),
      expr("""aggregate(cand,
                transform(sequence(0, size(toks)), x -> 0),
                (prev, ct) -> aggregate(sequence(1, size(toks)), array(0),
                  (row, j) -> concat(row, array(
                    IF(element_at(toks, j) = ct, element_at(prev, j) + 1,
                       greatest(element_at(prev, j + 1),
                                element_at(row, -1)))))),
                acc -> element_at(acc, -1))""").cast("long").as("hof"))
    assert(both.count() > 0)
    assert(both.filter(col("nat") =!= col("hof")).count() == 0)
    // edges: null element → null; empty candidate → 0; textbook case
    val edge = Seq(
      (Seq[String]("a", "b"), Seq[String]("a", null)),
      (Seq[String]("a", "b"), Seq[String]()),
      (Seq[String]("a", "b", "c", "b", "d", "a", "b"),
        Seq[String]("b", "d", "c", "a", "b", "a")))
      .toDF("a", "b")
      .select(VectorExpressions.lcsLength(col("a"), col("b")).as("l"))
      .collect()
    assert(edge(0).isNullAt(0))
    assert(edge(1).getLong(0) == 0L)
    assert(edge(2).getLong(0) == 4L) // LCS("abcbdab","bdcaba") = 4
  }

  test("NgramClippedMatches matches the explode+clip-join plan (q_eval_bleu)") {
    // parity on a real corpus slice: kernel vs the pure-DataFrame
    // explode -> per-(doc,n,gram) counts -> least(ccand, cref) clip
    val docs = Tables(spark, sf, "documents").limit(60)
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .withColumn("cand", expr(
        """transform(sequence(2, size(toks)),
             i -> IF(pmod(i, 7) = 0, 'xx', element_at(toks, i)))"""))
      .localCheckpoint(true)
    def gramCounts(c: String, cnt: String) = docs
      .select(col("doc_id"), explode(expr(
        s"""flatten(transform(array(1, 2, 3, 4),
              n -> transform(sequence(1, size($c) - n + 1),
                i -> named_struct('n', n,
                  'g', concat_ws(' ', slice($c, i, n))))))""")).as("x"))
      .select(col("doc_id"), col("x.n").as("n"), col("x.g").as("g"))
      .groupBy("doc_id", "n", "g").agg(count(lit(1L)).as(cnt))
    val ref = gramCounts("cand", "ccand")
      .join(gramCounts("toks", "cref"), Seq("doc_id", "n", "g"), "left")
      .groupBy("doc_id", "n")
      .agg(sum(least(col("ccand"), coalesce(col("cref"), lit(0L)))).as("m"))
    val nat = docs.select(col("doc_id"), explode(expr(
        "transform(sequence(1, 4), k -> named_struct('n', k, 'm', " +
        "element_at(graft_ngram_clipped_matches(toks, cand), k)))")).as("x"))
      .select(col("doc_id"), col("x.n").as("n"), col("x.m").as("m_nat"))
    VectorExpressions.register(spark)
    val cmp = nat.join(ref, Seq("doc_id", "n"), "left")
      .select(col("m_nat"), coalesce(col("m"), lit(0L)).as("m_ref"))
    assert(cmp.count() > 0)
    assert(cmp.filter(col("m_nat") =!= col("m_ref")).count() == 0)
    // edges: clipping caps repeats at the ref count; null element → null
    val edge = Seq(
      // ref has 2×'a'; cand has 4×'a' → unigram matches clip to 2
      (Seq("a", "b", "a"), Seq("a", "a", "a", "a")),
      (Seq("a", "b"), Seq("a", null)),
      // identical → m_n = len - n + 1
      (Seq("x", "y", "z", "w", "v"), Seq("x", "y", "z", "w", "v")))
      .toDF("a", "b")
      .select(VectorExpressions.ngramClippedMatches(col("a"), col("b")).as("m"))
      .collect()
    assert(edge(0).getSeq[Long](0) == Seq(2L, 0L, 0L, 0L))
    assert(edge(1).isNullAt(0))
    assert(edge(2).getSeq[Long](0) == Seq(5L, 4L, 3L, 2L))
  }

  test("AHash64 matches the HOF block-sum/threshold form (q_multimodal_phash)") {
    // parity on the real corpus INCLUDING the planted uppercase edits
    val base = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      base.filter(col("doc_id") < 30)
        .select((col("doc_id") + 20000L).as("doc_id"),
          concat(upper(substring(col("text"), 1, 1)),
            expr("substring(text, 2)")).as("text")))
    def byteat(p: String) =
      s"IF($p <= length(text), ascii(substring(text, $p, 1)), 0L)"
    val bsExpr =
      s"""transform(sequence(0, 63), b ->
            ${byteat("(2 * (b div 8)) * 16 + 2 * pmod(b, 8) + 1")} +
            ${byteat("(2 * (b div 8)) * 16 + 2 * pmod(b, 8) + 2")} +
            ${byteat("(2 * (b div 8) + 1) * 16 + 2 * pmod(b, 8) + 1")} +
            ${byteat("(2 * (b div 8) + 1) * 16 + 2 * pmod(b, 8) + 2")})"""
    val hof = corpus
      .withColumn("bs", expr(bsExpr))
      .withColumn("ts", expr("aggregate(bs, 0L, (a, x) -> a + x)"))
      .select(col("doc_id") +: (0 to 3).map(k =>
        expr(s"""aggregate(sequence(0, 15), 0L, (a, m) ->
                   a + IF(element_at(bs, ${16 * k} + m + 1) * 64 > ts,
                         shiftleft(1L, m), 0L))""").as(s"h$k")): _*)
    val nat = corpus
      .withColumn("ah", VectorExpressions.ahash64(col("text")))
      .select(col("doc_id") +: (0 to 3).map(k =>
        expr(s"shiftright(ah, ${16 * k}) & 65535").as(s"n$k")): _*)
    val cmp = nat.join(hof, "doc_id")
    assert(cmp.count() > 0)
    assert(cmp.filter((0 to 3).map(k =>
      col(s"n$k") =!= col(s"h$k")).reduce(_ || _)).count() == 0)
  }

  test("kernels execute inside whole-stage codegen") {
    val emb = Tables(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
    val df = emb.select(SimilarityOps.dot(col("e"), col("e")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan.take(1000)) // codegen stage marker
  }
}
