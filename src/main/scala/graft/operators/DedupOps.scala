package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GQuery, QueryModule, Tables}
import graft.Exact.dround

/** Deduplication block (north-star training-data pipeline ops): exact dedup
  * lives in PipelineOps (q_dedup_exact); here are the *near*-dup detectors —
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine — each fully
  * distributed and expressed with codegen'd built-ins (no UDFs).
  *
  * Cross-engine determinism: every hash is md5 (identical hex output in Spark
  * and DuckDB), so the oracle replays the exact same signatures. MinHash uses
  * the *lexicographic min of md5 hex strings* per hash function (a valid
  * uniform min-hash); SimHash uses the first 16 bits of md5 per token.
  *
  * Scale design: all four are linear-output formulations. MinHash emits
  * per-doc band keys (the LSH bucket join is a groupBy on the band key —
  * shuffle on a high-entropy key); Jaccard only scores pairs inside a
  * blocking prefix (never the quadratic all-pairs); embedding near-dup only
  * compares within an SRP (sign-random-projection) bucket.
  */
object DedupOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Memoized J ≥ 0.8 shingle-Jaccard ground-truth pairs (doc_a, doc_b,
    * jac_micro) — the truth AUDIT shared by the two recall gauges
    * (q_dedup_minhash_recall, q_dedup_lsh_tune). Built once per sfDir (the
    * CoGraph rule): re-deriving the truth intersect inside every gauge
    * benchmarked the AUDIT, not the operator.
    *
    * The truth side is SAMPLED, not corpus×corpus (the q_knn_join_recall
    * economics, SimilarityOps.scala:573-596): a deterministic ≤512-probe
    * set (first 512 doc_ids by md5 order — the portable hash anchor, so
    * both engines pick the same probes) is exact-scored against the FULL
    * corpus, and a pair enters the truth set iff either endpoint is a
    * probe (least/greatest canonicalization + distinct collapses the
    * both-probes double emission). Cost is sample×corpus — linear in the
    * corpus for a fixed sample — and the broadcast side is the ≤512-row
    * probe slice, never the whole corpus (the full-corpus broadcast was a
    * driver-memory killer at 100×). At the gate SF the corpus has ≤500
    * docs, so the sample IS the corpus and the emitted truth set is the
    * full all-pairs audit unchanged.
    */
  private[graft] object ShingleTruth {
    private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

    /** The truth-building plan, exposed for the PlanShapeSpec pin:
      * TakeOrderedAndProject probe selection + broadcast LeftSemi probe
      * filter; the corpus streams past the ≤512-row broadcast.
      */
    private[graft] def build(s: SparkSession, d: String): DataFrame = {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"), array_distinct(shingles(col("toks"))).as("sh"))
        .repartition(32)
        .localCheckpoint(true)
      val probeIds = docs.select(col("doc_id"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .limit(512) // TakeOrdered: distributed top-K, no global sort
      val p = docs.join(broadcast(probeIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id").as("p_id"), col("sh").as("sh_p"))
      val o = docs.select(col("doc_id").as("o_id"), col("sh").as("sh_o"))
      o.crossJoin(broadcast(p))
        .filter(col("p_id") =!= col("o_id"))
        .select(least(col("p_id"), col("o_id")).as("doc_a"),
          greatest(col("p_id"), col("o_id")).as("doc_b"),
          size(array_intersect(col("sh_p"), col("sh_o"))).as("ni"),
          (size(col("sh_p")) + size(col("sh_o"))).as("nb"))
        .select(col("doc_a"), col("doc_b"),
          expr("ni * 1000000L div (nb - ni)").as("jac_micro"))
        .filter(col("jac_micro") >= 800000L)
        .distinct()
    }

    def pairs(s: SparkSession, d: String): DataFrame = {
      val dir = dirs.computeIfAbsent(d, _ => {
        val out = java.nio.file.Files.createTempDirectory("graft-shtruth-")
          .toString
        build(s, d).write.mode("overwrite").parquet(out)
        out
      })
      Tables.readStable(s, dir)
    }
  }

  /** Lowercase whitespace tokens of documents.text. */
  private def tokens: Column = split(lower(col("text")), " ")

  /** 3-token shingles: one per starting position. */
  private[graft] def shingles(toks: Column): Column =
    transform(sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3))))

  /** First 4 hex chars of md5 as a long (0..65535) — the portable token hash.
    * DuckDB twin: strpos-table arithmetic (no conv() there), see duckHex4.
    */
  def hex4(c: Column): Column =
    conv(substring(md5(c), 1, 4), 16, 10).cast("long")

  /** DuckDB SQL for hex4 over expression `e` (re-evaluates e per digit — use
    * only on cheap expressions).
    */
  def duckHex4(e: String): String =
    Seq(4096, 256, 16, 1).zipWithIndex.map { case (m, i) =>
      s"(strpos('0123456789abcdef', substr($e, ${i + 1}, 1))-1)*$m"
    }.mkString("(", " + ", ")")

  private val duckTokens = "string_split(lower(text), ' ')"
  private val duckShingles =
    s"""list_transform(generate_series(1, greatest(len($duckTokens)-2, 1)),
        i -> array_to_string(list_slice($duckTokens, i, i+2), ' '))"""

  // ------------------------------------------------------ MinHash + LSH --

  /** MinHash (4 hash fns) + LSH banding (2 bands × 2 rows): per-doc band
    * keys plus the size of the doc's first-band bucket. Docs sharing a band
    * key are near-dup candidates; the bucket join is the window count here.
    * At scale: groupBy(band) instead of the window gives the candidate sets.
    *
    * One md5 per shingle, materialized once; the 4 hash functions are the 4
    * disjoint 8-hex-char slices of that digest (independent 32-bit hashes —
    * the standard one-digest MinHash trick). The naive form (4 md5s over a
    * 4×-recomputed shingle array) benchmarked 8× slower.
    */
  private val qDedupMinhash = GQuery(
    (s, d) => {
      val w = Window.partitionBy("b0")
      t(s, d, "documents")
        // native single-pass MinHashBands kernel (VectorExpressions):
        // shingle→md5→4×min fused, no shingle/digest/slice arrays allocated;
        // bit-exact with the interpreted form (VectorExpressionsSpec pin)
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"),
          graft.functions.VectorExpressions.minhashBands(col("toks")).as("bands"))
        .select(col("doc_id"),
          col("bands").getItem(0).as("b0"),
          col("bands").getItem(1).as("b1"))
        .withColumn("n_b0", count(lit(1)).over(w))
        .orderBy("doc_id")
    },
    Some {
      val mh = (0 until 4).map(k =>
        s"list_min(list_transform(hs, h -> substr(h, ${k * 8 + 1}, 8)))")
      s"""WITH sig AS (
            SELECT doc_id, list_transform($duckShingles, x -> md5(x)) AS hs
            FROM documents),
          m AS (
            SELECT doc_id,
                   ${mh(0)} || ${mh(1)} AS b0,
                   ${mh(2)} || ${mh(3)} AS b1
            FROM sig)
          SELECT doc_id, b0, b1,
                 CAST(count(*) OVER (PARTITION BY b0) AS BIGINT) AS n_b0
          FROM m ORDER BY doc_id"""
    })

  // ------------------------------------------------------------ SimHash --

  /** 16-bit SimHash per doc (bit b set iff more than half the token hashes
    * have bit b set), plus the doc's simhash-group size (near-dups collide).
    *
    * Computed by the native single-pass `SimHash16` kernel (VectorExpressions)
    * — bit-exact with the original 16-HOF-pass fold (pinned by
    * VectorExpressionsSpec), which cost 16 interpreted `aggregate` passes
    * per doc. The DuckDB oracle still spells out the md5-bit majority vote.
    */
  private val qDedupSimhash = GQuery(
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"),
          graft.functions.VectorExpressions.simhash16(col("toks")).as("simhash"))
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy("simhash")))
        .orderBy("doc_id"),
    Some {
      val bits = (0 until 16).map { b =>
        s"""CASE WHEN 2 * list_sum(list_transform(vals, v -> (v >> $b) & 1))
                    > len(vals) THEN ${1L << b} ELSE 0 END"""
      }.mkString(" + ")
      s"""WITH v AS (
            SELECT doc_id,
                   list_transform($duckTokens, t -> ${duckHex4("md5(t)")}) AS vals
            FROM documents)
          SELECT doc_id, CAST($bits AS BIGINT) AS simhash,
                 CAST(count(*) OVER (PARTITION BY CAST($bits AS BIGINT)) AS BIGINT)
                   AS n_same
          FROM v ORDER BY doc_id"""
    })

  // ----------------------------------------------------- n-gram Jaccard --

  /** Exact Jaccard over distinct 3-token shingles, computed only for pairs
    * blocked on the same first-2-token prefix (linear candidate generation —
    * never all-pairs). Emits every blocked pair with its score.
    */
  /** Distinct 64-bit shingle hashes of the materialized `toks` column:
    * xxhash64 over each 3-token window (no shingle strings materialized;
    * long-array ops beat string arrays 4×). Oracle twins intersect/join the
    * literal shingle strings — counts agree because a 64-bit collision
    * inside one doc's ~100-shingle set is ~1e-17, and outputs carry only
    * counts, never hash values (CLAUDE.md xxhash64 rule).
    * <3-token docs: element_at past the array throws under ANSI mode — fall
    * back to one whole-doc shingle (matches the oracle's short list_slice
    * join exactly: equality of the joined string).
    */
  private[graft] def shingleHashes: Column =
    when(size(col("toks")) >= 3, array_distinct(
      transform(sequence(lit(1), size(col("toks")) - 2),
        i => xxhash64(element_at(col("toks"), i),
          element_at(col("toks"), i + 1), element_at(col("toks"), i + 2)))))
      .otherwise(array(xxhash64(concat_ws(" ", col("toks")))))

  /** Stop-block threshold for the 2-token-prefix blocking (shared intent
    * with TextOps.LevMaxBlock): prefixes are Zipfian, so an uncapped block
    * self-join is O(hottest²) in one reducer at scale (VERDICT r4). Blocks
    * past the cap are DROPPED — q_decontaminate's stop-shingle pattern —
    * and the cap is mirrored in the oracle so the sf0.01 t2 hash gates the
    * guard itself (size-4 blocks exist at sf0.01; the drop path runs).
    */
  private[graft] val NgramMaxBlock = 3
  private val qDedupNgramJaccard = GQuery(
    (s, d) => {
      // `toks` MUST be a materialized column: expressions captured inside a
      // lambda re-evaluate per call, so an inline split() would rerun 3× per
      // shingle position.
      val sh = shingleHashes
      val docs = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"),
          concat_ws(" ", slice(col("toks"), 1, 2)).as("pre"),
          sh.as("sh"))
        // membership counted with a window (one blk shuffle, reused by the
        // self-join below); hot blocks dropped before any pair forms
        .withColumn("nb", count(lit(1)).over(Window.partitionBy("pre")))
        .filter(col("nb") <= NgramMaxBlock)
        .drop("nb")
      val a = docs.select(col("doc_id").as("doc_a"), col("pre"), col("sh").as("sh_a"))
      val b = docs.select(col("doc_id").as("doc_b"), col("pre").as("pre_b"),
        col("sh").as("sh_b"))
      a.join(b, col("pre") === col("pre_b") && col("doc_a") < col("doc_b"))
        // intersect once; union derived (|A|+|B|-|A∩B|) — a second
        // array_intersect doubled this query's cost in the bench
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("sh_a"), col("sh_b"))).as("n_inter"),
          (size(col("sh_a")) + size(col("sh_b"))).as("n_both"))
        .select(col("doc_a"), col("doc_b"), col("n_inter"),
          (col("n_both") - col("n_inter")).as("n_union"))
        .withColumn("jaccard",
          dround(col("n_inter").cast("double") / col("n_union"), 3))
        .orderBy("doc_a", "doc_b")
    },
    Some(
      s"""WITH t0 AS (
            SELECT doc_id,
                   array_to_string(list_slice($duckTokens, 1, 2), ' ') AS pre,
                   list_distinct($duckShingles) AS sh
            FROM documents),
          t AS (
            SELECT doc_id, pre, sh FROM (
              SELECT *, count(*) OVER (PARTITION BY pre) AS nb FROM t0)
            WHERE nb <= $NgramMaxBlock),
          p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS n_inter,
                   len(a.sh) + len(b.sh)
                     - len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS n_union
            FROM t a JOIN t b ON a.pre = b.pre AND a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, CAST(n_inter AS INT) AS n_inter,
                 CAST(n_union AS INT) AS n_union,
                 CAST(round(CAST(CAST(n_inter AS DOUBLE) / n_union
                   AS DECIMAL(30,8)), 3) AS DOUBLE) AS jaccard
          FROM p ORDER BY doc_a, doc_b"""))

  // ------------------------------------------- embedding-cosine near-dup --

  /** SRP (sign-random-projection) bucket LSH for cosine similarity. Each
    * vector reports its nearest neighbor *within its bucket* (singleton
    * buckets emit nothing). At scale this is the linear-candidate near-dup
    * pass; brute force is q_embed_knn in SimilarityOps.
    *
    * HOT-BUCKET GUARD (VERDICT r4): a low-entropy corpus — near-duplicate
    * shards, exactly what a dedup pass sees — collapses into few 6-bit
    * buckets, making the in-bucket self-join quadratic. Two levels, both
    * window-counted (the q_decontaminate pattern) and both mirrored in the
    * oracle:
    *  1. REFINE — buckets past `EmbedBucketCap` members re-key on 12 SRP
    *     bits. The 12-bit key is a strict refinement of the 6-bit key (same
    *     sign function, low 6 bits identical), so cool buckets are
    *     untouched and hot ones split ~64-way; `+ 64` keeps the two key
    *     spaces disjoint. This is the real scale knob: bits grow with
    *     log2(corpus/cap), one level shown here.
    *  2. DROP — rows whose refined bucket STILL exceeds the cap are dropped
    *     (the hard recursion bound; a degenerate all-identical-sign corpus
    *     ends here instead of in an O(n²) reducer). Exercised by a
    *     synthetic hot corpus in DedupGuardSpec; at sf0.01 the refine path
    *     runs (6-bit buckets reach 15 > cap 10), gated by the t2 hash.
    */
  private[graft] val EmbedBucketCap = 10
  private val qDedupEmbed = GQuery(
    (s, d) => {
      import graft.functions.SimilarityOps.{dot, norm, srpBucket}
      val e = t(s, d, "embeddings").select(col("vec_id"),
        srpBucket(col("embedding")).as("b6"),
        srpBucket(col("embedding"), 12).as("b12"),
        col("embedding").cast("array<double>").as("emb"))
        .withColumn("nrm", norm(col("emb")))
        .withColumn("n6", count(lit(1)).over(Window.partitionBy("b6")))
        .withColumn("bucket",
          when(col("n6") > EmbedBucketCap, col("b12") + 64).otherwise(col("b6")))
        .withColumn("n2", count(lit(1)).over(Window.partitionBy("bucket")))
        .filter(col("n2") <= EmbedBucketCap)
        .select(col("vec_id"), col("bucket"), col("emb"), col("nrm"))
      val a = e.select(col("vec_id").as("a_id"), col("bucket"),
        col("emb").as("emb_a"), col("nrm").as("nrm_a"))
      val b = e.select(col("vec_id").as("b_id"), col("bucket").as("bucket_b"),
        col("emb").as("emb_b"), col("nrm").as("nrm_b"))
      val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id").asc)
      a.join(b, col("bucket") === col("bucket_b") && col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"), col("bucket"),
          dround(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6)
            .as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("a_id"), col("b_id").as("nn_id"), col("bucket").cast("int").as("bucket"),
          dround(col("cos"), 3).as("score"))
        .orderBy("a_id")
    },
    Some {
      val b6 = graft.functions.SimilarityOps.duckSrpBucket()
      val b12 = graft.functions.SimilarityOps.duckSrpBucket(bits = 12)
      s"""WITH b0 AS (
            SELECT vec_id, $b6 AS b6, $b12 AS b12,
                   CAST(embedding AS DOUBLE[]) AS emb
            FROM embeddings),
          b1 AS (
            SELECT vec_id, emb,
                   CASE WHEN count(*) OVER (PARTITION BY b6) > $EmbedBucketCap
                        THEN b12 + 64 ELSE b6 END AS bucket
            FROM b0),
          b AS (
            SELECT vec_id, bucket, emb FROM (
              SELECT *, count(*) OVER (PARTITION BY bucket) AS n2 FROM b1)
            WHERE n2 <= $EmbedBucketCap),
          p AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket,
                   CAST(round(CAST(list_cosine_similarity(a.emb, b.emb)
                     AS DECIMAL(30,8)), 6) AS DOUBLE) AS cos
            FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
          r AS (
            SELECT *, row_number() OVER (PARTITION BY a_id
                        ORDER BY cos DESC, b_id) AS rn
            FROM p)
          SELECT a_id, b_id AS nn_id, CAST(bucket AS INT) AS bucket,
                 CAST(round(CAST(cos AS DECIMAL(30,8)), 3) AS DOUBLE) AS score
          FROM r WHERE rn = 1 ORDER BY a_id"""
    })

  // --------------------------------------- dup-cluster connected components --

  /** Near-dup clustering: connected components over the bipartite doc↔band
    * graph (a doc touches its two LSH band buckets; docs sharing either band
    * are connected, and chains A~B~C merge transitively). Implemented as
    * iterative smallest-label propagation — the Pregel pattern in DataFrame
    * form: each round is two shuffles (band-min, then doc-min), labels are
    * monotone decreasing, and the loop stops at fixpoint. localCheckpoint
    * per round truncates the exponentially-growing lineage. At 100 TB this
    * is exactly GraphX/GraphFrames connected components: O(diameter) rounds,
    * all data distributed; only the single `changed == 0` counter crosses to
    * the driver. Oracle: recursive-CTE transitive closure + min label.
    */
  private val qDedupComponents = GQuery(
    (s, d) => {
      // band keys via the fused MinHashBands kernel (bit-exact with the
      // interpreted shingle→md5→array_min form; VectorExpressionsSpec pin)
      val sig = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"),
          graft.functions.VectorExpressions.minhashBands(col("toks")).as("bands"))
        .select(col("doc_id"),
          col("bands").getItem(0).as("b0"), col("bands").getItem(1).as("b1"))
      // persist (memory) + count each round: materializes the new labels and
      // truncates nothing — but with O(diameter) ≈ 3-5 rounds the lineage
      // stays shallow, and skipping localCheckpoint's disk write halves the
      // per-round cost. Old rounds unpersist to bound the cache footprint.
      // explode_OUTER: plain explode's InferFiltersFromGenerate pushes
      // size/isnotnull of array(b0,b1) below the projections, re-running the
      // MinHashBands kernel twice per row in the filter (see q_decontaminate,
      // where the same rule cost 7×); the 2-element array is never
      // null/empty, so OUTER is identical and skips the inferred filter.
      val bands = sig.select(col("doc_id"),
        explode_outer(array(col("b0"), col("b1"))).as("band"))
        .persist()
      var labels = sig.select(col("doc_id"), col("doc_id").as("lbl"))
        .localCheckpoint(true)
      var converged = false
      var iters = 0
      while (!converged && iters < 20) {
        // carry the previous label through the round so convergence is
        // checked on the materialized output — no separate join-and-count
        // job per round (labels are monotone non-increasing, so
        // lbl == prev everywhere ⟺ fixpoint)
        val withPrev = bands.join(labels, "doc_id")
          .withColumnRenamed("lbl", "prev")
        val bandMin = withPrev.groupBy("band").agg(min("prev").as("bmin"))
        // checkpoint the labels each round: without truncation the plan
        // doubles per iteration (join of join of ...), and codegen cost
        // grows faster than the data work at this size
        val next = withPrev.join(bandMin, "band")
          .groupBy("doc_id").agg(min("bmin").as("lbl"), min("prev").as("prev"))
          .localCheckpoint(true)
        val changed = next.filter(col("lbl") =!= col("prev")).count()
        labels = next.select("doc_id", "lbl")
        converged = changed == 0
        iters += 1
      }
      bands.unpersist()
      if (!converged)
        throw new IllegalStateException(
          s"label propagation did not converge in $iters rounds")
      labels
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy("lbl")))
        .select(col("doc_id"), col("lbl").as("component"), col("n_members"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE $componentsCte
          SELECT doc_id, component,
                 CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members
          FROM lbl ORDER BY doc_id"""))

  /** The recursive transitive-closure prefix shared by the components oracle
    * and the keep-list oracle: doc↔band edges → reachability → min-label
    * `lbl(doc_id, component)`.
    */
  private lazy val componentsCte: String = {
    val mh = (0 until 4).map(k =>
      s"list_min(list_transform(hs, h -> substr(h, ${k * 8 + 1}, 8)))")
    s"""sig AS (
          SELECT doc_id, list_transform($duckShingles, x -> md5(x)) AS hs
          FROM documents),
        m AS (
          SELECT doc_id, ${mh(0)} || ${mh(1)} AS b0, ${mh(2)} || ${mh(3)} AS b1
          FROM sig),
        e AS (
          SELECT a.doc_id AS a, b.doc_id AS b
          FROM m a JOIN m b ON a.b0 = b.b0 AND a.doc_id <> b.doc_id
          UNION
          SELECT a.doc_id, b.doc_id
          FROM m a JOIN m b ON a.b1 = b.b1 AND a.doc_id <> b.doc_id),
        reach AS (
          SELECT doc_id AS a, doc_id AS b FROM m
          UNION
          SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        lbl AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a)"""
  }

  /** The DECISION step near-dup clustering exists for: per duplicate
    * cluster, KEEP the highest-quality member and emit the drop list. The
    * quality key here is `n_chars` (ties → lowest doc_id; production plugs
    * any score — the q_text_quality composite, rarity, recency — into the
    * same struct-max), chosen per component with a single window max of
    * `struct(quality, −doc_id)` over the components output: one extra
    * shuffle past the clustering itself, no joins back to text. Singleton
    * components keep themselves, so `keep` partitions the corpus exactly
    * into survivors and drops — `sum(keep::int) = #components`.
    */
  private val qDedupKeep = GQuery(
    (s, d) => {
      val comp = qDedupComponents.fn(s, d).select("doc_id", "component")
      val quality = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
      val w = Window.partitionBy("component")
      comp.join(quality, "doc_id")
        .withColumn("best",
          max(struct(col("n_chars"), (-col("doc_id")).as("nd"))).over(w))
        .select(col("doc_id"), col("component"), col("n_chars"),
          (-col("best.nd")).as("keeper"))
        .withColumn("keep", col("doc_id") === col("keeper"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE $componentsCte,
          q AS (
            SELECT l.doc_id, l.component, d.n_chars
            FROM lbl l JOIN documents d USING (doc_id)),
          k AS (
            SELECT component, doc_id AS keeper FROM (
              SELECT component, doc_id,
                     row_number() OVER (PARTITION BY component
                       ORDER BY n_chars DESC, doc_id) AS rn
              FROM q) WHERE rn = 1)
          SELECT q.doc_id, q.component, CAST(q.n_chars AS BIGINT) AS n_chars,
                 k.keeper, q.doc_id = k.keeper AS keep
          FROM q JOIN k USING (component) ORDER BY q.doc_id"""))

  /** Keeper choice with SPAN EVIDENCE — closes the loop between the
    * cluster graph (q_dedup_components) and the duplicated-span audit
    * (q_dedup_substring), the way Lee et al. 2022's pipeline actually
    * decides: within each near-dup cluster, keep the document with the
    * LEAST duplicated-span coverage (integer ppm of tokens inside spans
    * that occur elsewhere in the corpus), tie-breaking on length then id —
    * cleanest-content-wins instead of q_dedup_keep's longest-wins. Both
    * signal paths are the already-oracled operators; this query is their
    * deterministic composition, so the keeper list is stable under
    * re-runs by construction (every rank key is an exact integer).
    *
    * Scale: components and span coverage are each linear-with-caps
    * (see their rows); the composition adds one doc-keyed left join and a
    * component-partitioned argmin window — bounded by docs, not pairs.
    */
  private val qDedupKeepSpans = GQuery(
    (s, d) => {
      val comp = qDedupComponents.fn(s, d).select("doc_id", "component")
      val spans = qDedupSubstring.fn(s, d)
        .select(col("doc_id"), col("covered"), col("ntok"))
      val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
      val w = Window.partitionBy("component")
      comp.join(docs, "doc_id")
        .join(spans, Seq("doc_id"), "left")
        .withColumn("dup_ppm",
          coalesce(expr("covered * 1000000 div ntok"), lit(0L)))
        .withColumn("best", min(struct(col("dup_ppm"),
          (-col("n_chars")).as("nc"), col("doc_id"))).over(w))
        .select(col("doc_id"), col("component"), col("dup_ppm"),
          col("n_chars").cast("long").as("n_chars"),
          col("best.doc_id").as("keeper"))
        .withColumn("keep", col("doc_id") === col("keeper"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH RECURSIVE $componentsCte,
          $substringCovCtes,
          q AS (
            SELECT l.doc_id, l.component, d.n_chars,
                   coalesce(sc.covered * 1000000 // sc.ntok, 0) AS dup_ppm
            FROM lbl l JOIN documents d USING (doc_id)
            LEFT JOIN subcov sc ON sc.doc_id = l.doc_id),
          k AS (
            SELECT component, doc_id AS keeper FROM (
              SELECT component, doc_id,
                     row_number() OVER (PARTITION BY component
                       ORDER BY dup_ppm ASC, n_chars DESC, doc_id) AS rn
              FROM q) WHERE rn = 1)
          SELECT q.doc_id, q.component, CAST(q.dup_ppm AS BIGINT) AS dup_ppm,
                 CAST(q.n_chars AS BIGINT) AS n_chars, k.keeper,
                 q.doc_id = k.keeper AS keep
          FROM q JOIN k USING (component) ORDER BY q.doc_id"""))

  /** Train/test DECONTAMINATION — the eval-integrity step of every LLM data
    * pipeline: find held-out (test-split) documents sharing 3-token shingles
    * with the training split, so leaked eval content can be dropped before
    * training. Splits are the same deterministic hash-of-key buckets as
    * q_split_train (train <80, test ≥90); candidate generation is the
    * shingle-hash key join — linear in total shingles, never a doc-pair
    * product. A train-side document-frequency cap (df ≤ 50) drops ubiquitous
    * shingles first — the stop-shingle guard real decontamination pipelines
    * use, and the at-scale safety valve: without it one boilerplate phrase
    * shared by millions of train docs would blow up the join. The final
    * two-distinct aggregate Expands ×2 over contaminated (test, shingle,
    * train) triples only — bounded by contamination volume, not the corpus.
    * Output: per contaminated test doc, #distinct shared shingles and
    * #distinct train docs implicated.
    */
  private val qDecontaminate = GQuery(
    (s, d) => {
      val bucket = pmod(hex4(col("doc_id").cast("string")), lit(100))
      val docs = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"), bucket.as("bucket"), shingleHashes.as("sh"))
      // df as a window over the exploded train shingles — the q_text_tfidf
      // trick: ONE shuffle of the train side on shash, no df-groupBy self-join
      // (which would evaluate the shingle subtree twice).
      // explode_OUTER, deliberately: plain explode triggers
      // InferFiltersFromGenerate, which pushes `size(sh)>0 AND isnotnull(sh)`
      // below the projections with the WHOLE shingle expression inlined —
      // split() then re-evaluates per lambda element inside the filter,
      // measured 9-12 s (vs ~1.5 s) at sf0.1. sh is never null/empty for
      // non-null text, and a null shash row joins nothing, so OUTER is
      // semantically identical and skips the inferred filter.
      val train = docs.filter(col("bucket") < 80)
        .select(col("doc_id").as("train_doc"), explode_outer(col("sh")).as("shash"))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy("shash"))) // pairs distinct ⇒ df = doc freq
        .filter(col("df") <= 50)
        .drop("df")
      val test = docs.filter(col("bucket") >= 90)
        .select(col("doc_id").as("test_doc"), explode_outer(col("sh")).as("shash"))
      test.join(train, "shash")
        .groupBy("test_doc")
        .agg(countDistinct("shash").as("n_shared"),
          countDistinct("train_doc").as("n_train_docs"))
        .orderBy("test_doc")
    },
    Some(s"""WITH docs AS (
              SELECT doc_id,
                     ${duckHex4("md5(CAST(doc_id AS VARCHAR))")} % 100 AS bucket,
                     list_distinct($duckShingles) AS sh
              FROM documents),
            tr AS (
              SELECT doc_id AS train_doc, unnest(sh) AS shash
              FROM docs WHERE bucket < 80),
            kept AS (
              SELECT shash FROM (
                SELECT shash, count(*) AS df FROM tr GROUP BY 1)
              WHERE df <= 50),
            te AS (
              SELECT doc_id AS test_doc, unnest(sh) AS shash
              FROM docs WHERE bucket >= 90)
            SELECT test_doc,
                   CAST(count(DISTINCT te.shash) AS BIGINT) AS n_shared,
                   CAST(count(DISTINCT tr.train_doc) AS BIGINT) AS n_train_docs
            FROM te JOIN tr ON te.shash = tr.shash
                    JOIN kept ON kept.shash = te.shash
            GROUP BY 1 ORDER BY test_doc"""))

  // ------------------------------------- incremental dedup vs band index --

  /** The maintained MinHash band index: a bucketed table of (band, hist_doc)
    * rows — the persisted dedup state a 100-TB pipeline carries between
    * batches. Incremental dedup of a new batch then NEVER rescans corpus
    * text: it minhashes only the new documents and joins their band keys
    * against the index, whose CLUSTERED BY (band) layout feeds the
    * SortMergeJoin without an index-side exchange (only the small new side
    * shuffles into the bucket partitioning). `append` is the maintenance
    * step: after a batch is admitted, its band keys INSERT INTO the bucketed
    * table, keeping the index current for the next batch — an append of
    * bucketed files, no rewrite of the existing index.
    */
  object BandIndex {
    /** Per-sfDir table name (a global name would serve one SF's index to
      * another in a shared session — the q_join_bucketed rule).
      */
    def name(d: String): String =
      s"graft_band_idx_${java.lang.Integer.toHexString(d.hashCode)}"

    /** (doc_id, band) rows of a documents-shaped frame via the fused
      * MinHashBands kernel. explode_OUTER for the same
      * InferFiltersFromGenerate reason as q_decontaminate.
      */
    def bands(docs: DataFrame): DataFrame = docs
      .select(col("doc_id"), tokens.as("toks"))
      .select(col("doc_id"),
        graft.functions.VectorExpressions.minhashBands(col("toks")).as("bands"))
      .select(col("doc_id"), explode_outer(col("bands")).as("band"))

    /** Build the index over `history` (CTAS, 8 band buckets) if absent.
      * The staging view and the DDL run on the FRAME's session, not the
      * caller's: under foreachBatch the batch frame belongs to a per-batch
      * session clone (shared catalog, separate temp views), and splitting
      * the pair across sessions loses the view.
      */
    def ensure(s: SparkSession, d: String, history: DataFrame): String = {
      val idx = name(d)
      if (!s.catalog.tableExists(idx)) {
        val base = java.nio.file.Files.createTempDirectory("graft-bandidx-").toString
        bands(history).select(col("doc_id").as("hist_doc"), col("band"))
          .createOrReplaceTempView("graft_band_idx_src")
        history.sparkSession.sql(
          s"""CREATE TABLE $idx USING parquet
              CLUSTERED BY (band) SORTED BY (band) INTO 8 BUCKETS
              LOCATION '$base'
              AS SELECT * FROM graft_band_idx_src""")
      }
      idx
    }

    /** Admit a batch into the index (bucketed append — no index rewrite).
      * Session discipline as in ensure(): view + INSERT on the batch's own
      * session, so the call works identically from batch code and from
      * inside foreachBatch.
      */
    def append(s: SparkSession, d: String, batch: DataFrame): Unit = {
      bands(batch).select(col("doc_id").as("hist_doc"), col("band"))
        .createOrReplaceTempView("graft_band_idx_add")
      batch.sparkSession.sql(
        s"INSERT INTO ${name(d)} SELECT * FROM graft_band_idx_add")
      // the INSERT refreshes the BATCH session's relation cache only; the
      // caller's session still holds the pre-append file listing and would
      // silently miss the new bands — refresh it explicitly
      s.catalog.refreshTable(name(d))
    }
  }

  /** Incremental corpus dedup: the new batch (hash bucket ≥ 80 — the same
    * deterministic split convention as q_decontaminate) minhashed and joined
    * against the PERSISTED band index of history (bucket < 80). The history
    * corpus text is never rescanned — the plan holds exactly one scan of
    * `documents` (the new slice) plus the bucketed index scan with no
    * exchange above it (PlanShapeSpec pin). Oracle: the full-recompute
    * identity — DuckDB re-derives both sides' bands from scratch and must
    * agree exactly. Output per new doc: #distinct history near-dup
    * candidates, the smallest such doc, and the dup flag.
    */
  private val qDedupIncremental = GQuery(
    (s, d) => {
      val bucket = pmod(hex4(col("doc_id").cast("string")), lit(100))
      val idx = BandIndex.ensure(s, d,
        t(s, d, "documents").filter(bucket < 80))
      val newBands = BandIndex.bands(
        t(s, d, "documents").filter(bucket >= 80))
      // MERGE hint: at toy SF the index fits a broadcast, but the whole
      // point of the bucketed layout is the 100-TB shape — SMJ whose
      // index side reads co-located buckets shuffle-free
      newBands.join(s.table(idx).hint("MERGE"), Seq("band"), "left")
        .groupBy("doc_id")
        .agg(countDistinct("hist_doc").as("n_hist_docs"),
          min("hist_doc").as("first_hit"))
        .withColumn("is_dup", col("n_hist_docs") > 0)
        .orderBy("doc_id")
    },
    Some {
      val mh = (0 until 4).map(k =>
        s"list_min(list_transform(hs, h -> substr(h, ${k * 8 + 1}, 8)))")
      s"""WITH sig AS (
            SELECT doc_id,
                   ${duckHex4("md5(CAST(doc_id AS VARCHAR))")} % 100 AS bucket,
                   list_transform($duckShingles, x -> md5(x)) AS hs
            FROM documents),
          m AS (
            SELECT doc_id, bucket,
                   ${mh(0)} || ${mh(1)} AS b0, ${mh(2)} || ${mh(3)} AS b1
            FROM sig),
          hist AS (
            SELECT doc_id AS hist_doc, unnest([b0, b1]) AS band
            FROM m WHERE bucket < 80),
          newb AS (
            SELECT doc_id, unnest([b0, b1]) AS band
            FROM m WHERE bucket >= 80)
          SELECT n.doc_id,
                 CAST(count(DISTINCT h.hist_doc) AS BIGINT) AS n_hist_docs,
                 min(h.hist_doc) AS first_hit,
                 count(DISTINCT h.hist_doc) > 0 AS is_dup
          FROM newb n LEFT JOIN hist h ON n.band = h.band
          GROUP BY n.doc_id ORDER BY doc_id"""
    })

  /** Substring-level dedup signal (the Lee et al. 2022 "deduplicating
    * training data" shape, arXiv:2107.06499 — remove REPEATED SPANS, not
    * whole docs): every 5-token span that occurs more than once in the
    * corpus (within OR across docs) is a duplicated span; per doc, the
    * TOKEN COVERAGE of its duplicated spans (union of overlapping [start,
    * start+4] intervals — a running-max window, the standard interval-union
    * trick) yields `covered` and `dup_ratio`, the fraction of the doc that
    * is boilerplate/copy. A doc-level near-dup (q_dedup_minhash) misses a
    * clean doc with one plagiarized paragraph; this is the operator that
    * catches it, and at 100 TB the span table keys on a span HASH (here the
    * span text itself — cross-engine-exact; the md5 swap is one line), so
    * candidate generation stays linear: explode to (span, doc, start) →
    * count-over-span WINDOW (one pass — not a groupBy + join-back, which
    * would recompute the exploded spans; plan-pinned single corpus scan) →
    * per-doc interval-union window. Everything is integer arithmetic until
    * the final ratio, which goes through dround.
    */
  /** Shared CTE chain of the duplicated-span coverage oracle, ending in
    * `subcov(doc_id, ntok, covered)` — q_dedup_substring reads it directly;
    * q_dedup_keep_spans joins it into the component keeper choice. Lazy for
    * the same forward-reference reason as componentsCte.
    */
  private lazy val substringCovCtes: String =
    """sd AS (
              SELECT doc_id, string_split(lower(text), ' ') AS toks
              FROM documents),
            sspans AS (
              SELECT doc_id, len(toks) AS ntok,
                     unnest(CASE WHEN len(toks) >= 5
                                 THEN generate_series(1, len(toks) - 4)
                                 ELSE [] END) AS start,
                     toks
              FROM sd),
            ssp AS (
              SELECT doc_id, ntok, start,
                     array_to_string(list_slice(toks, start, start + 4), ' ')
                       AS span
              FROM sspans),
            sdup AS (SELECT span FROM ssp GROUP BY span HAVING count(*) > 1),
            shits AS (SELECT ssp.* FROM ssp JOIN sdup USING (span)),
            scov AS (
              SELECT doc_id, ntok, start, start + 4 AS e,
                     max(start + 4) OVER (PARTITION BY doc_id ORDER BY start
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_end
              FROM shits),
            subcov AS (
              SELECT doc_id, CAST(ntok AS BIGINT) AS ntok,
                     CAST(sum(greatest(e - greatest(coalesce(prev_end, 0),
                       start - 1), 0)) AS BIGINT) AS covered
              FROM scov GROUP BY doc_id, ntok)"""

  private val qDedupSubstring = GQuery(
    (s, d) => {
      val L = 5
      val sp = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .withColumn("ntok", size(col("toks")))
        .withColumn("starts",
          when(col("ntok") >= L, sequence(lit(1), col("ntok") - (L - 1)))
            .otherwise(array().cast("array<int>")))
        .select(col("doc_id"), col("ntok"), col("toks"),
          explode(col("starts")).as("start"))
        .select(col("doc_id"), col("ntok"), col("start"),
          concat_ws(" ", slice(col("toks"), col("start"), lit(L))).as("span"))
      // duplicated-span detection is a WINDOW over span, not a groupBy +
      // join-back — one pass over the exploded spans instead of two (the
      // q_decontaminate df-as-window precedent; same shuffle key either way)
      val wSpan = Window.partitionBy("span")
      val w = Window.partitionBy("doc_id").orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
      sp.withColumn("n_span", count(lit(1)).over(wSpan))
        .filter(col("n_span") > 1)
        .select(col("doc_id"), col("ntok"), col("start"),
          (col("start") + (L - 1)).as("e"))
        .withColumn("prev_end", max(col("e")).over(w))
        .select(col("doc_id"), col("ntok"),
          greatest(col("e") - greatest(coalesce(col("prev_end"), lit(0)),
            col("start") - 1), lit(0)).as("contrib"))
        .groupBy("doc_id", "ntok")
        .agg(sum("contrib").cast("long").as("covered"))
        .select(col("doc_id"), col("ntok").cast("long").as("ntok"), col("covered"),
          dround(col("covered").cast("double") / col("ntok"), 4).as("dup_ratio"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $substringCovCtes
            SELECT doc_id, ntok, covered,
                   CAST(round(CAST(CAST(covered AS DOUBLE) / ntok
                     AS DECIMAL(30,8)), 4) AS DOUBLE) AS dup_ratio
            FROM subcov ORDER BY doc_id"""))

  // ------------------------------------------- semantic (SemDeDup) dedup --

  /** Cluster-partitioned embedding near-dup (the SemDeDup recipe: k-means
    * the corpus, then compare only WITHIN a cluster): the learned-partition
    * complement to q_dedup_embed's random-projection buckets — centroids
    * adapt to where the corpus actually is, so semantically-close vectors
    * co-locate even when a random hyperplane would separate them.
    *
    * Assignment reuses q_embed_kmeans' fixed-point machinery (quantized
    * ints, broadcast centroids, packed-long argmin) so the partition is
    * hash-exact cross-engine; only the final cosine SCORE is floating, and
    * it goes through the dround rail like every other scorer. Oversized
    * clusters (dense corpus regions — exactly where a dedup pass lands)
    * split into SRP-12 sub-buckets before pairing, the same stop-block
    * pattern as q_dedup_embed/q_decontaminate: candidate generation stays
    * linear, never quadratic in a hot cluster. The cap (30) is low enough
    * that the split path is exercised at the ORACLE scale, not just in
    * production.
    */
  private[graft] val SemClusterCap = 30
  private val qDedupSemantic = GQuery(
    (s, d) => {
      import graft.functions.SimilarityOps.{dot, norm, srpBucket}
      val base = t(s, d, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"),
        srpBucket(col("embedding"), 12).as("b12"),
        transform(col("embedding").cast("array<double>"),
          x => floor(x * lit(1000d) + lit(0.5d)).cast("long") + lit(1000L))
          .as("qarr"))
        // 2 consumers (seed centroids + the assign crossJoin) — scan,
        // SRP-hash and quantize once
        .localCheckpoint(true)
      val cents = base.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("qarr").as("carr"))
      val assigned = base.crossJoin(broadcast(cents))
        .withColumn("dist",
          aggregate(
            zip_with(col("qarr"), col("carr"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x))
        .groupBy("vec_id")
        .agg(min(col("dist") * lit(32L) + col("cid")).as("m"),
          first(col("emb")).as("emb"), first(col("b12")).as("b12"))
        .select(col("vec_id"), pmod(col("m"), lit(32L)).as("cluster"),
          col("emb"), col("b12"))
        .withColumn("nrm", norm(col("emb")))
      val keyed = assigned
        .withColumn("n1", count(lit(1)).over(Window.partitionBy("cluster")))
        .withColumn("bucket", when(col("n1") <= SemClusterCap, col("cluster"))
          .otherwise(col("cluster") * 4096 + col("b12") + 16))
        .withColumn("n2", count(lit(1)).over(Window.partitionBy("bucket")))
        .filter(col("n2") <= SemClusterCap)
        // both sides of the bucket self-join — the assign + two capping
        // windows used to replay per side
        .localCheckpoint(true)
      val a = keyed.select(col("vec_id").as("a_id"), col("cluster"),
        col("bucket"), col("emb").as("emb_a"), col("nrm").as("nrm_a"))
      val b = keyed.select(col("vec_id").as("b_id"),
        col("bucket").as("bucket_b"), col("emb").as("emb_b"),
        col("nrm").as("nrm_b"))
      val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id").asc)
      a.join(b, col("bucket") === col("bucket_b") && col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("cluster"), col("b_id"),
          dround(dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")), 6)
            .as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("a_id"), col("cluster").cast("int").as("cluster"),
          col("b_id").as("nn_id"), dround(col("cos"), 3).as("score"),
          (col("cos") >= 0.4).as("is_dup"))
        .orderBy("a_id")
    },
    Some {
      val b12 = graft.functions.SimilarityOps.duckSrpBucket(bits = 12)
      s"""WITH q AS (
            SELECT vec_id,
                   unnest(list_transform(CAST(embedding AS DOUBLE[]),
                     x -> CAST(floor(x*1000 + 0.5) AS BIGINT) + 1000)) AS v,
                   unnest(generate_series(1, len(embedding))) AS dim
            FROM embeddings),
          c0 AS (SELECT vec_id AS cid, dim, v AS c FROM q WHERE vec_id < 16),
          d1 AS (
            SELECT q.vec_id, c0.cid, sum((q.v - c0.c)*(q.v - c0.c)) AS dist
            FROM q JOIN c0 USING (dim) GROUP BY 1, 2),
          asg AS (
            SELECT vec_id, min(dist*32 + cid) % 32 AS cluster
            FROM d1 GROUP BY 1),
          e0 AS (
            SELECT em.vec_id, asg.cluster,
                   CAST(embedding AS DOUBLE[]) AS emb, $b12 AS b12
            FROM embeddings em JOIN asg ON em.vec_id = asg.vec_id),
          e1 AS (
            SELECT *, CASE WHEN count(*) OVER (PARTITION BY cluster)
                             <= $SemClusterCap
                      THEN cluster ELSE cluster*4096 + b12 + 16 END AS bucket
            FROM e0),
          e AS (
            SELECT vec_id, cluster, bucket, emb FROM (
              SELECT *, count(*) OVER (PARTITION BY bucket) AS n2 FROM e1)
            WHERE n2 <= $SemClusterCap),
          p AS (
            SELECT a.vec_id AS a_id, a.cluster, b.vec_id AS b_id,
                   CAST(round(CAST(list_cosine_similarity(a.emb, b.emb)
                     AS DECIMAL(30,8)), 6) AS DOUBLE) AS cos
            FROM e a JOIN e b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
          r AS (
            SELECT *, row_number() OVER (PARTITION BY a_id
                        ORDER BY cos DESC, b_id) AS rn
            FROM p)
          SELECT a_id, CAST(cluster AS INT) AS cluster, b_id AS nn_id,
                 CAST(round(CAST(cos AS DECIMAL(30,8)), 3) AS DOUBLE) AS score,
                 cos >= 0.4 AS is_dup
          FROM r WHERE rn = 1 ORDER BY a_id"""
    })

  // ------------------------------------------ exact set-similarity join --

  /** Exact set-similarity self-join via PREFIX FILTERING (PPJoin family,
    * Xiao et al. 2008): all document pairs with token-set Jaccard ≥ 0.9 —
    * EXACTLY, no LSH approximation — without the all-pairs product. The
    * other near-dup scorers here are probabilistic (MinHash bands, SimHash,
    * SRP buckets); this is the exact counterpart for when recall must be 1.
    *
    * The filter theorem: order tokens by a GLOBAL total order (ascending
    * document frequency, token tiebreak — rarest first); if J(x,y) ≥ t then
    * the first |x|−⌈t·|x|⌉+1 tokens of x and the first |y|−⌈t·|y|⌉+1 of y
    * (in that order) share at least one token. So candidates = pairs
    * sharing a PREFIX token, a join keyed on rare tokens, plus the length
    * filter 100·min(n) ≥ 90·max(n); each candidate is then verified with
    * the exact intersection. All comparisons are cross-multiplied integers.
    *
    * PPJoin's POSITIONAL filter: both token arrays are sorted by the same
    * global order, so for the minimal-rank common token at (1-based)
    * positions p_a, p_b the overlap is at most 1 + min(n_a−p_a, n_b−p_b);
    * a match failing (1+min)·(100+τ100) ≥ τ100·(n_a+n_b) cannot be the
    * minimal match of a qualifying pair. Here the length AND positional
    * constraints are encoded INTO the candidate join key (probe-side
    * (size, position) enumeration — see the inline comment), the suffix
    * bound prunes pairs after the match agg, and the exact verify is the
    * fused SortedIntersectCount merge walk. All prune-only: the oracle is
    * untouched. Measured at sf0.1: match rows 22.4M → 4.2M, wall 8.7 s →
    * ~4.5-5 s on the worst-case 31-word vocabulary.
    *
    * Scale: the token-rank window runs over the VOCABULARY (|V| ≪ corpus;
    * same single-partition caveat as the unigram side of q_vocab_bigrams),
    * then broadcasts. Prefix tokens are the globally RAREST — on a Zipfian
    * vocabulary the candidate blocks are small by construction (the prefix
    * of a hot token is carried only by docs where it is among the rarest
    * ~10%), the opposite economics of naive 2-token-prefix blocking. At
    * sf0.01 the synthetic 30-word vocabulary makes every block hot — the
    * worst case for this operator and still exact.
    */
  private val SetJoinTau100 = 90
  private val qDedupSetjoin = GQuery(
    (s, d) => {
      // Everything downstream of the rank join runs on INTEGER token ranks
      // (the global frequency order is a bijection of the vocabulary):
      // candidate keys hash ints, and the exact verify intersects int
      // arrays instead of string arrays — same values, measured ~2× on the
      // verify-bound profile. `ranked` is materialized ONCE and feeds the
      // prefix build AND both verification joins; `pref` feeds both sides
      // of the candidate self-join — Spark does not share subplans across
      // join sides, so without the checkpoints the tokenize/rank chain
      // runs per side (measured 90 s → 27 s at sf0.1 when first added).
      // Same storage economics as the PageRank edge checkpoint:
      // MEMORY_AND_DISK, spills rather than OOMs at scale.
      // NARROW candidate schema (r13, guide §2.3/§5): every column that
      // crosses the candidate join's exchanges is INT, not LONG — doc ids
      // (dense, < 2³¹ at any plausible doc count; the cast back to LONG at
      // the output boundary restores the exact original values), set sizes
      // and prefix positions (≤ doc token count), and the enumerated
      // partner (size, position) keys. The join keys (ptok, nb, pb) drop
      // from 24 to 12 bytes/row and the carried payload halves — same
      // rows, same matches, prune-only economics.
      val docs0 = t(s, d, "documents")
        .select(col("doc_id").cast("int").as("did"),
          array_distinct(tokens).as("ts"))
        .withColumn("n", size(col("ts")))
      val tok = docs0.select(col("did"), col("n"),
        explode(col("ts")).as("tok"))
      val rank = tok.groupBy("tok").agg(count(lit(1)).as("df"))
        .withColumn("rk",
          row_number().over(Window.orderBy(col("df").asc, col("tok").asc)))
        .select("tok", "rk")
      val ranked = tok.join(broadcast(rank), "tok")
        .groupBy(col("did"), col("n"))
        .agg(sort_array(collect_list(col("rk"))).as("rts"))
        .localCheckpoint(true)
      val pref = ranked
        .withColumn("p",
          (col("n") - expr(s"(n * $SetJoinTau100 + 99) div 100") + 1).cast("int"))
        .select(col("did"), col("n"),
          posexplode(slice(col("rts"), lit(1), col("p"))))
        .select(col("did"), col("n"), (col("pos") + 1).as("pos"),
          col("col").as("ptok"))
        .localCheckpoint(true)
      // LENGTH- AND POSITION-KEYED candidate join: J ≥ τ forces near-equal
      // set sizes (100·min ≥ τ100·max) and the positional filter bounds the
      // partner's match position (overlap ≤ 1 + min(na−pa, nb−pb)), so the
      // probe side explodes each prefix row to its few admissible
      // (partner size, partner position) combinations and the join keys on
      // (ptok, SIZE, POSITION) — length and positional disqualification
      // happen IN the join key, not as post-filters over the full
      // token-match product (22.4M → 4.2M match rows at sf0.1; the explode
      // factor is (sizes ≈ n(1−τ²)/τ) × (positions ≤ nb − mreq ≈ 2),
      // ~10 on this corpus, against a 5.3× smaller join output).
      // Integer equivalences: the positional predicate
      // (1+m)·(100+τ100) ≥ τ100·s (m = min slack, s = na+nb) holds iff
      // m ≥ mreq = ⌈τ100·s/(100+τ100)⌉ − 1, iff BOTH na−pa ≥ mreq and
      // nb−pb ≥ mreq — the min splits exactly over the two sides.
      val probe = pref
        .withColumn("nb", explode(sequence(
          expr(s"CAST((n * $SetJoinTau100 + 99) div 100 AS INT)"),
          expr(s"CAST((n * 100) div $SetJoinTau100 AS INT)"))))
        .withColumn("mreq", expr(
          s"CAST(((n + nb) * $SetJoinTau100 + ${SetJoinTau100 + 99}) " +
            s"div ${100 + SetJoinTau100} - 1 AS INT)"))
        .filter(col("n") - col("pos") >= col("mreq"))
        .withColumn("pb", explode(when(col("nb") - col("mreq") >= 1,
          sequence(lit(1), col("nb") - col("mreq")))
          .otherwise(array().cast("array<int>"))))
        .select(col("ptok"), col("nb"), col("pb"), col("did").as("doc_a"),
          col("n").as("na"), col("pos").as("pa"))
      val cand = probe
        .join(pref.select(col("ptok"), col("n").as("nb"),
          col("did").as("doc_b"), col("pos").as("pb")),
          Seq("ptok", "nb", "pb"))
        .filter(col("doc_a") < col("doc_b"))
        // SUFFIX bound (the PPJoin accumulation): the distinct() this
        // replaces deduped candidate matches; the same shuffle as a
        // combine-heavy agg additionally yields, per pair, the number of
        // common PREFIX tokens o_pp and the LAST match's positions. Both
        // arrays are sorted by the one global rank order, so any common
        // token not counted in o_pp ranks above the last match in BOTH
        // docs (a lower-ranked common token would sit inside both
        // prefixes and be counted) — total overlap ≤ o_pp +
        // min(na−pa_max, nb−pb_max). Pairs whose bound cannot reach
        // ⌈τ·(na+nb)/(1+τ)⌉ never reach the exact verify joins.
        // Prune-only: the oracle is untouched.
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(count(lit(1L)).as("opp"),
          max("pa").as("pam"), max("pb").as("pbm"))
        .filter((col("opp")
            + least(col("na") - col("pam"), col("nb") - col("pbm")))
          * (100 + SetJoinTau100)
          >= (col("na") + col("nb")) * SetJoinTau100)
        .select("doc_a", "doc_b", "na", "nb")
      cand
        .join(ranked.select(col("did").as("doc_a"), col("rts").as("ts_a")),
          "doc_a")
        .join(ranked.select(col("did").as("doc_b"), col("rts").as("ts_b")),
          "doc_b")
        // exact verify on the sorted rank arrays: a fused two-pointer merge
        // count (SortedIntersectCount) — no per-pair hash set or
        // intermediate array like size(array_intersect(...)) builds
        .withColumn("inter", graft.functions.VectorExpressions
          .sortedIntersectCount(col("ts_a"), col("ts_b")))
        .filter(col("inter") * 100 >= (col("na") + col("nb") - col("inter")) * SetJoinTau100)
        // output boundary: restore the contract LONG types (values exact —
        // the INT leg was a lossless dense-id dictionary)
        .select(col("doc_a").cast("long").as("doc_a"),
          col("doc_b").cast("long").as("doc_b"), col("inter"),
          col("na").cast("long").as("na"), col("nb").cast("long").as("nb"),
          dround(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4)
            .as("jac"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""WITH d AS (
              SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS ts
              FROM documents),
            e AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n, unnest(ts) AS tok
                  FROM d),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(count(*) AS BIGINT) AS inter, a.n AS na, b.n AS nb
              FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 4, 5)
            SELECT doc_a, doc_b, inter, na, nb,
                   CAST(round(CAST(CAST(inter AS DOUBLE) / (na + nb - inter)
                     AS DECIMAL(30,8)), 4) AS DOUBLE) AS jac
            FROM pairs
            WHERE inter * 100 >= (na + nb - inter) * $SetJoinTau100
            ORDER BY doc_a, doc_b"""))

  /** Recall of the MinHash/LSH banding against exact-Jaccard truth — the
    * q_knn_recall pattern applied to the dedup family, so the oracle gate
    * owns the LSH recall claim instead of a spec assertion. Truth: every
    * doc pair with exact 3-shingle Jaccard ≥ 0.8 (25 planted pairs at
    * sf0.01). Found: pairs colliding in EITHER LSH band (the candidate set
    * q_dedup_minhash's banding generates). Emits each truth pair with its
    * integer-micro Jaccard and a found flag; at b=2 bands of r=2 rows the
    * expected catch probability at j=0.8 is 1−(1−j²)² ≈ 0.87, and the
    * hashed flags pin the realized catches exactly.
    *
    * The truth side is the SAMPLED exact-Jaccard audit (ShingleTruth:
    * deterministic md5-ordered ≤512 probes × corpus — sample = corpus at
    * the gate SF); the found side is band-KEYED self-joins, the
    * production shape.
    */
  private val qDedupMinhashRecall = GQuery(
    (s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"),
          graft.functions.VectorExpressions.minhashBands(col("toks")).as("bands"))
        .select(col("doc_id"),
          col("bands").getItem(0).as("b0"), col("bands").getItem(1).as("b1"))
        .localCheckpoint(true) // feeds the 2 band joins
      val a = docs.select(col("doc_id").as("doc_a"),
        col("b0").as("a0"), col("b1").as("a1"))
      val b = docs.select(col("doc_id").as("doc_b"),
        col("b0").as("c0"), col("b1").as("c1"))
      val truth = ShingleTruth.pairs(s, d)
      val cand = a.select(col("doc_a"), col("a0").as("k"))
        .join(b.select(col("doc_b"), col("c0").as("k")), "k")
        .unionByName(a.select(col("doc_a"), col("a1").as("k"))
          .join(b.select(col("doc_b"), col("c1").as("k")), "k"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
        .withColumn("hit", lit(1))
      truth.join(cand, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("jac_micro"),
          col("hit").isNotNull.as("found"))
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val mh = (0 until 4).map(k =>
        s"list_min(list_transform(hs, h -> substr(h, ${k * 8 + 1}, 8)))")
      s"""WITH t0 AS (
            SELECT doc_id, list_distinct($duckShingles) AS sh,
                   list_transform($duckShingles, x -> md5(x)) AS hs
            FROM documents),
          m AS (
            SELECT doc_id, sh,
                   ${mh(0)} || ${mh(1)} AS b0,
                   ${mh(2)} || ${mh(3)} AS b1
            FROM t0),
          probes AS (
            SELECT doc_id FROM m
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 512),
          truth AS (
            SELECT DISTINCT least(p.doc_id, o.doc_id) AS doc_a,
                   greatest(p.doc_id, o.doc_id) AS doc_b,
                   len(list_intersect(p.sh, o.sh)) * 1000000
                     // (len(p.sh) + len(o.sh)
                         - len(list_intersect(p.sh, o.sh))) AS jac_micro
            FROM m p
            JOIN probes pr ON pr.doc_id = p.doc_id
            JOIN m o ON o.doc_id <> p.doc_id),
          tr AS (SELECT * FROM truth WHERE jac_micro >= 800000),
          cand AS (
            SELECT DISTINCT doc_a, doc_b FROM (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM m a JOIN m b ON a.b0 = b.b0 AND a.doc_id < b.doc_id
              UNION ALL
              SELECT a.doc_id, b.doc_id
              FROM m a JOIN m b ON a.b1 = b.b1 AND a.doc_id < b.doc_id))
          SELECT tr.doc_a, tr.doc_b, CAST(tr.jac_micro AS BIGINT) AS jac_micro,
                 c.doc_a IS NOT NULL AS found
          FROM tr LEFT JOIN cand c
            ON c.doc_a = tr.doc_a AND c.doc_b = tr.doc_b
          ORDER BY tr.doc_a, tr.doc_b"""
    })

  // ------------------------------------------------- LSH banding sweep --

  /** LSH design sweep — the b×r S-curve measured on the corpus: the SAME
    * four MinHash values banded three ways (4 bands × 1 row, 2 × 2, 1 × 4)
    * against ground truth (Jaccard ≥ 0.8 pairs), emitting candidate count,
    * recall, and precision per configuration. More/shorter bands ⇒ the
    * collision probability 1−(1−s^r)^b shifts left ⇒ more candidates,
    * higher recall, lower precision — this query is how the production
    * banding (q_dedup_minhash's 2×2) gets CHOSEN rather than guessed.
    * Individual hash minima are recovered as the 8-hex slices of the fused
    * MinHashBands kernel output, so the sweep re-hashes nothing; the band
    * INDEX is part of the join key (h0 colliding with another doc's h1 is
    * not a candidate).
    *
    * Scale: candidates come from keyed band joins (stop-block caps apply as
    * in production dedup); ground truth is the SAMPLED ShingleTruth audit
    * (≤512 md5-ordered probes × corpus), the sweep itself stays keyed.
    */
  private val qDedupLshTune = GQuery(
    (s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"),
          graft.functions.VectorExpressions.minhashBands(col("toks")).as("bd"))
        .select(col("doc_id"),
          substring(col("bd").getItem(0), 1, 8).as("h0"),
          substring(col("bd").getItem(0), 9, 8).as("h1"),
          substring(col("bd").getItem(1), 1, 8).as("h2"),
          substring(col("bd").getItem(1), 9, 8).as("h3"))
        .localCheckpoint(true)
      val keys = base.select(col("doc_id"), explode(array(
          struct(lit("b4r1").as("cfg"), lit(0).as("b"), col("h0").as("k")),
          struct(lit("b4r1").as("cfg"), lit(1).as("b"), col("h1").as("k")),
          struct(lit("b4r1").as("cfg"), lit(2).as("b"), col("h2").as("k")),
          struct(lit("b4r1").as("cfg"), lit(3).as("b"), col("h3").as("k")),
          struct(lit("b2r2").as("cfg"), lit(0).as("b"),
            concat(col("h0"), col("h1")).as("k")),
          struct(lit("b2r2").as("cfg"), lit(1).as("b"),
            concat(col("h2"), col("h3")).as("k")),
          struct(lit("b1r4").as("cfg"), lit(0).as("b"),
            concat(col("h0"), col("h1"), col("h2"), col("h3")).as("k"))))
          .as("s"))
        .select(col("doc_id"), col("s.cfg").as("cfg"), col("s.b").as("b"),
          col("s.k").as("k"))
      val cand = keys.select(col("cfg"), col("b"), col("k"),
          col("doc_id").as("doc_a"))
        .join(keys.select(col("cfg"), col("b"), col("k"),
          col("doc_id").as("doc_b")), Seq("cfg", "b", "k"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("cfg"), col("doc_a"), col("doc_b")).distinct()
        .localCheckpoint(true) // feeds the count agg AND the truth join
      val truth = ShingleTruth.pairs(s, d).select(col("doc_a"), col("doc_b"))
      val nTruth = truth.agg(count(lit(1L)).as("n_truth"))
      val perCfg = cand.groupBy("cfg").agg(count(lit(1L)).as("n_cand"))
      val found = cand.join(truth, Seq("doc_a", "doc_b"))
        .groupBy("cfg").agg(count(lit(1L)).as("n_found"))
      perCfg.join(found, Seq("cfg"), "left")
        .crossJoin(broadcast(nTruth))
        .select(col("cfg"), col("n_cand"), col("n_truth"),
          coalesce(col("n_found"), lit(0L)).as("n_found"),
          expr("coalesce(n_found, 0) * 1000000 div n_truth").as("recall_ppm"),
          expr("coalesce(n_found, 0) * 1000000 div n_cand").as("prec_ppm"))
        .orderBy("cfg")
    },
    Some {
      val mh = (0 until 4).map(k =>
        s"list_min(list_transform(hs, h -> substr(h, ${k * 8 + 1}, 8)))")
      s"""WITH t0 AS (
            SELECT doc_id, list_distinct($duckShingles) AS sh,
                   list_transform($duckShingles, x -> md5(x)) AS hs
            FROM documents),
          m AS (
            SELECT doc_id, sh, ${mh(0)} AS h0, ${mh(1)} AS h1,
                   ${mh(2)} AS h2, ${mh(3)} AS h3
            FROM t0),
          keys AS (
            SELECT doc_id, 'b4r1' AS cfg, 0 AS b, h0 AS k FROM m
            UNION ALL SELECT doc_id, 'b4r1', 1, h1 FROM m
            UNION ALL SELECT doc_id, 'b4r1', 2, h2 FROM m
            UNION ALL SELECT doc_id, 'b4r1', 3, h3 FROM m
            UNION ALL SELECT doc_id, 'b2r2', 0, h0 || h1 FROM m
            UNION ALL SELECT doc_id, 'b2r2', 1, h2 || h3 FROM m
            UNION ALL SELECT doc_id, 'b1r4', 0, h0 || h1 || h2 || h3 FROM m),
          cand AS (
            SELECT DISTINCT x.cfg, x.doc_id AS doc_a, y.doc_id AS doc_b
            FROM keys x JOIN keys y
              ON x.cfg = y.cfg AND x.b = y.b AND x.k = y.k
                 AND x.doc_id < y.doc_id),
          probes AS (
            SELECT doc_id FROM m
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 512),
          truth AS (
            SELECT DISTINCT least(p.doc_id, o.doc_id) AS doc_a,
                   greatest(p.doc_id, o.doc_id) AS doc_b
            FROM m p
            JOIN probes pr ON pr.doc_id = p.doc_id
            JOIN m o ON o.doc_id <> p.doc_id
            WHERE len(list_intersect(p.sh, o.sh)) * 1000000
                    // (len(p.sh) + len(o.sh)
                        - len(list_intersect(p.sh, o.sh))) >= 800000),
          nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
          pc AS (SELECT cfg, CAST(count(*) AS BIGINT) AS n_cand
                 FROM cand GROUP BY cfg),
          fd AS (SELECT c.cfg, CAST(count(*) AS BIGINT) AS n_found
                 FROM cand c JOIN truth t
                   ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
                 GROUP BY c.cfg)
          SELECT pc.cfg, pc.n_cand, nt.n_truth,
                 CAST(coalesce(fd.n_found, 0) AS BIGINT) AS n_found,
                 CAST(coalesce(fd.n_found, 0) * 1000000 // nt.n_truth
                   AS BIGINT) AS recall_ppm,
                 CAST(coalesce(fd.n_found, 0) * 1000000 // pc.n_cand
                   AS BIGINT) AS prec_ppm
          FROM pc LEFT JOIN fd ON fd.cfg = pc.cfg CROSS JOIN nt
          ORDER BY pc.cfg"""
    })

  // ------------------------------------------ n-gram overlap (BLEU-ish) --

  /** Modified n-gram precision between LSH candidate pairs — the BLEU
    * numerator machinery pointed at dedup: for every b0-band collision
    * (hypothesis = the higher doc_id, reference = the lower), the clipped
    * unigram and bigram precisions Σ_g min(c_hyp(g), c_ref(g)) / |hyp| and
    * the length ratio, all exact ppm rationals. Near-1 p2 with near-1
    * length ratio ⇒ verbatim duplicate; high p1 with low p2 ⇒ shared
    * vocabulary but reordered text (template spam) — evidence the Jaccard
    * family can't see because sets forget multiplicity AND order.
    *
    * Scale: candidate pairs come from the production band join (never
    * all-pairs); the clipped-count join explodes only the CANDIDATES'
    * tokens (pairs × per-doc vocab), and n-gram count tables are
    * map-side-combined. The sequence(1, size-1) bigram generator is
    * guarded for 1-token docs (Spark sequence counts DOWN when a > b).
    */
  private val qEvalNgramOverlap = GQuery(
    (s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"), col("toks"),
          graft.functions.VectorExpressions.minhashBands(col("toks")).as("bd"))
        .select(col("doc_id"), col("toks"), col("bd").getItem(0).as("b0"))
        .localCheckpoint(true)
      val pairs = base.select(col("doc_id").as("doc_a"), col("b0"))
        .join(base.select(col("doc_id").as("doc_b"), col("b0")), "b0")
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
        .localCheckpoint(true)
      val bigrams = when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", element_at(col("toks"), i),
            element_at(col("toks"), i + 1))))
        .otherwise(array().cast("array<string>"))
      // only docs that appear in a candidate pair ever reach the clipped
      // joins — prune the gram aggs to that (small) doc set BEFORE the
      // explode, and materialize: each cnt is consumed twice (hyp + ref
      // side), which used to replay the full-corpus gram agg 4× total
      val pairDocs = pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
        .localCheckpoint(true)
      def counts(g: org.apache.spark.sql.Column) = base
        .join(broadcast(pairDocs), "doc_id")
        .select(col("doc_id"), explode(g).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1L)).as("c"))
        .localCheckpoint(true)
      def clipped(cnt: DataFrame, name: String) = pairs
        .join(cnt.select(col("doc_id").as("doc_b"), col("g"),
          col("c").as("ch")), "doc_b")
        .join(cnt.select(col("doc_id").as("doc_a"), col("g"),
          col("c").as("cr")), Seq("doc_a", "g"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(least(col("ch"), col("cr"))).as(name))
      val lens = base.select(col("doc_id"), size(col("toks")).cast("long").as("len"))
      val uni = clipped(counts(col("toks")), "ov1")
      val bi = clipped(counts(bigrams), "ov2")
      pairs
        .join(uni, Seq("doc_a", "doc_b"), "left")
        .join(bi, Seq("doc_a", "doc_b"), "left")
        .join(lens.select(col("doc_id").as("doc_a"), col("len").as("len_r")),
          "doc_a")
        .join(lens.select(col("doc_id").as("doc_b"), col("len").as("len_h")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          expr("coalesce(ov1, 0) * 1000000 div len_h").as("p1_ppm"),
          when(col("len_h") > 1,
            expr("coalesce(ov2, 0) * 1000000 div (len_h - 1)")).otherwise(0L)
            .as("p2_ppm"),
          expr("len_h * 1000000 div len_r").as("len_ratio_ppm"))
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val mh = (0 until 2).map(k =>
        s"list_min(list_transform(hs, h -> substr(h, ${k * 8 + 1}, 8)))")
      s"""WITH t0 AS (
            SELECT doc_id, $duckTokens AS tk,
                   list_transform($duckShingles, x -> md5(x)) AS hs
            FROM documents),
          m AS (SELECT doc_id, tk, ${mh(0)} || ${mh(1)} AS b0 FROM t0),
          pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM m a JOIN m b ON a.b0 = b.b0 AND a.doc_id < b.doc_id),
          uni AS (
            SELECT doc_id, unnest(tk) AS g FROM m),
          uc AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
          big AS (
            SELECT doc_id,
                   unnest(CASE WHEN len(tk) >= 2 THEN
                     list_transform(generate_series(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i + 1])
                     ELSE [] END) AS g
            FROM m),
          bc AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2),
          ov1 AS (
            SELECT p.doc_a, p.doc_b, sum(least(h.c, r.c)) AS ov
            FROM pairs p
            JOIN uc h ON h.doc_id = p.doc_b
            JOIN uc r ON r.doc_id = p.doc_a AND r.g = h.g
            GROUP BY 1, 2),
          ov2 AS (
            SELECT p.doc_a, p.doc_b, sum(least(h.c, r.c)) AS ov
            FROM pairs p
            JOIN bc h ON h.doc_id = p.doc_b
            JOIN bc r ON r.doc_id = p.doc_a AND r.g = h.g
            GROUP BY 1, 2),
          lens AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS len FROM m)
          SELECT p.doc_a, p.doc_b,
                 CAST(coalesce(o1.ov, 0) * 1000000 // lh.len AS BIGINT)
                   AS p1_ppm,
                 CAST(CASE WHEN lh.len > 1 THEN
                     coalesce(o2.ov, 0) * 1000000 // (lh.len - 1)
                   ELSE 0 END AS BIGINT) AS p2_ppm,
                 CAST(lh.len * 1000000 // lr.len AS BIGINT) AS len_ratio_ppm
          FROM pairs p
          LEFT JOIN ov1 o1 ON o1.doc_a = p.doc_a AND o1.doc_b = p.doc_b
          LEFT JOIN ov2 o2 ON o2.doc_a = p.doc_a AND o2.doc_b = p.doc_b
          JOIN lens lr ON lr.doc_id = p.doc_a
          JOIN lens lh ON lh.doc_id = p.doc_b
          ORDER BY p.doc_a, p.doc_b"""
    })

  /** Asymmetric shingle CONTAINMENT (Broder's resemblance/containment
    * split): C(s, d) = |sh(s) ∩ sh(d)| / |sh(s)| — the quote/subset
    * detector the SYMMETRIC Jaccard family structurally misses (a 30-token
    * snippet fully contained in a 300-token doc has Jaccard ≈ 0.1 but
    * containment 1.0). Probes are planted: the first 30 tokens of docs
    * id < 40 re-enter as snippets (id + 30000); each must surface against
    * its source at containment 10⁶ ppm, plus any other doc sharing enough
    * of the opening. Same 2-token-prefix blocking + stop-block cap as
    * q_dedup_ngram_jaccard (mirrored in the oracle); the readout is
    * EXACT integer ppm (count div count — no fp anywhere).
    *
    * Scale: snippet-side probes against the capped block index — the
    * candidate count is probe-bounded, never corpus²; at 100 TB the doc
    * side is the same persisted shingle index the dedup family shares.
    */
  private val qDedupContainment = GQuery(
    (s, d) => {
      val base = t(s, d, "documents")
        .select(col("doc_id"), tokens.as("toks"))
        .select(col("doc_id"),
          concat_ws(" ", slice(col("toks"), 1, 2)).as("pre"),
          shingleHashes.as("sh"))
        .withColumn("nb", count(lit(1)).over(Window.partitionBy("pre")))
        .filter(col("nb") <= NgramMaxBlock)
        .drop("nb")
      val snips = t(s, d, "documents")
        .filter(col("doc_id") < 40)
        .select((col("doc_id") + 30000L).as("sid"), tokens.as("toks"))
        .select(col("sid"), slice(col("toks"), 1, 30).as("toks"))
        .select(col("sid"),
          concat_ws(" ", slice(col("toks"), 1, 2)).as("pre_s"),
          shingleHashes.as("sh_s"))
      snips.join(base, col("pre_s") === col("pre"))
        .select(col("sid"), col("doc_id"),
          size(array_intersect(col("sh_s"), col("sh"))).cast("long")
            .as("n_inter"),
          size(col("sh_s")).cast("long").as("n_snip"))
        .withColumn("containment_ppm",
          expr("n_inter * 1000000 div n_snip"))
        .filter(col("containment_ppm") >= 800000L)
        .orderBy("sid", "doc_id")
    },
    Some(
      s"""WITH t0 AS (
            SELECT doc_id,
                   array_to_string(list_slice($duckTokens, 1, 2), ' ') AS pre,
                   list_distinct($duckShingles) AS sh
            FROM documents),
          t AS (
            SELECT doc_id, pre, sh FROM (
              SELECT *, count(*) OVER (PARTITION BY pre) AS nb FROM t0)
            WHERE nb <= $NgramMaxBlock),
          s0 AS (
            SELECT doc_id + 30000 AS sid,
                   list_slice($duckTokens, 1, 30) AS ts
            FROM documents WHERE doc_id < 40),
          s1 AS (
            SELECT sid,
                   array_to_string(list_slice(ts, 1, 2), ' ') AS pre,
                   list_distinct(list_transform(
                     generate_series(1, greatest(len(ts) - 2, 1)),
                     i -> array_to_string(list_slice(ts, i, i + 2), ' ')))
                     AS sh_s
            FROM s0),
          p AS (
            SELECT s.sid, t.doc_id,
                   CAST(len(list_filter(s.sh_s,
                     x -> list_contains(t.sh, x))) AS BIGINT) AS n_inter,
                   CAST(len(s.sh_s) AS BIGINT) AS n_snip
            FROM s1 s JOIN t ON s.pre = t.pre)
          SELECT sid, doc_id, n_inter, n_snip,
                 CAST(n_inter * 1000000 // n_snip AS BIGINT)
                   AS containment_ppm
          FROM p WHERE n_inter * 1000000 // n_snip >= 800000
          ORDER BY sid, doc_id"""))

  /** Batch NOVELTY rate — the data-valuation readout an acquisition
    * pipeline runs BEFORE paying to ingest a crawl (q_dedup_incremental
    * answers "which docs are dups"; this answers "how much NEW information
    * does each source bring"): per incoming source (src10+, the "new
    * batch"), the fraction of its distinct 5-gram shingles absent from
    * the base corpus (src0–9), in exact ppm, plus distinct/total shingle
    * volumes. A source full of unseen shingles is worth ingesting; one
    * near 0 is a re-crawl. Left-anti semantics via a left join + null
    * count so a single pass carries both numerator and denominator.
    *
    * Scale: shingles collapse to per-(source, shingle) DISTINCT grids
    * map-side; the base side is a distinct-shingle table (bounded by
    * content, not corpus size — the dedup family's shingle economics);
    * the join keys on the shingle string. At 100 TB the base table is the
    * same persisted artifact q_dedup_incremental indexes.
    */
  private val qCorpusNovelty = GQuery(
    (s, d) => {
      def shingles(df: DataFrame) = df
        .select(col("source"), split(lower(col("text")), " ").as("toks"))
        .filter(size(col("toks")) >= 5)
        .select(col("source"), explode(expr(
          """transform(sequence(1, size(toks) - 4),
               i -> concat_ws(' ', slice(toks, i, 5)))""")).as("sh"))
      val docs = t(s, d, "documents")
      // src0..src9 have 4-char names (base corpus); src10.. are the batch
      val base = shingles(docs.filter(length(col("source")) === 4))
        .select(col("sh")).distinct()
      val batch = shingles(docs.filter(length(col("source")) === 5))
        .groupBy("source", "sh").agg(count(lit(1L)).as("c"))
      batch.join(base.withColumn("seen", lit(1)), Seq("sh"), "left")
        .groupBy("source")
        .agg(count(lit(1L)).as("n_distinct"),
          sum("c").as("n_total"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty_ppm",
          expr("n_novel * 1000000 div n_distinct"))
        .orderBy("source")
    },
    Some("""WITH sh AS (
              SELECT source, array_to_string(toks[i:i+4], ' ') AS sh
              FROM (SELECT source, string_split(lower(text), ' ') AS toks
                    FROM documents WHERE
                      len(string_split(lower(text), ' ')) >= 5) t,
                   LATERAL (SELECT unnest(generate_series(1, len(toks) - 4))
                     AS i) ii),
            base AS (
              SELECT DISTINCT sh FROM sh WHERE len(source) = 4),
            batch AS (
              SELECT source, sh, CAST(count(*) AS BIGINT) AS c
              FROM sh WHERE len(source) = 5 GROUP BY 1, 2)
            SELECT b.source,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(b.c) AS BIGINT) AS n_total,
                   CAST(sum(CASE WHEN ba.sh IS NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_novel,
                   CAST(sum(CASE WHEN ba.sh IS NULL THEN 1 ELSE 0 END)
                     * 1000000 // count(*) AS BIGINT) AS novelty_ppm
            FROM batch b LEFT JOIN base ba ON ba.sh = b.sh
            GROUP BY 1 ORDER BY b.source"""))

  // -------------------------------------- content-defined chunking --

  /** Content-defined chunking dedup (the Rabin/FastCDC idea on a token
    * stream) — the INSERTION-RESILIENT rung of the dedup ladder: fixed
    * shingles shift under one inserted token, but CDC cut points derive
    * from local content (a rolling 8-token polynomial hash, cut where
    * h ≡ 0 mod 16 → ~16-token expected chunks), so an edit only
    * re-chunks its neighborhood and every chunk elsewhere still matches
    * byte-for-byte. Chunk hash = md5 of the token span; a chunk of ≥ 4
    * tokens seen in ≥ 2 distinct docs is duplicate evidence (shorter
    * chunks collide trivially on this 31-type vocabulary), and per doc the
    * duplicated-token fraction (ppm) is the CDC analogue of
    * q_dedup_substring's span coverage. The rolling hash is exact
    * integer (hex4 token hashes × a literal 31-power table, % 2²⁰ —
    * no pow(), no fp), guards: docs under 9 tokens get no interior
    * cuts (the descending-sequence trap), boundary set always contains
    * {1, L+1}.
    *
    * Scale: chunking is map-only per doc; the only shuffle groups by
    * chunk md5 — high-entropy 128-bit keys, perfectly balanced, and the
    * storage-dedup economics apply (chunk index ≈ tokens/16 entries,
    * appendable exactly like the minhash band index for incremental
    * runs).
    */
  private val qDedupCdc = GQuery(
    (s, d) => {
      // THREE materialization barriers, not a style choice: CollapseProject
      // merges withColumn chains, so a lambda referencing `th`/`b` would
      // otherwise capture the full EXPRESSION and re-evaluate it per element
      // (the HOF-capture invariant) — the rolling-hash filter then recomputes
      // every token's md5 for every window position and the chunking goes
      // cubic in doc length (observed: one 9-minute task at sf0.1).
      // Checkpointed, `th` and `b` are attribute reads and the pass is
      // linear per doc.
      val hashed = t(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        .withColumn("l", size(col("toks")))
        .withColumn("th", transform(col("toks"), tk => hex4(tk)))
        .localCheckpoint(true) // th materialized: one md5 per token, ever
      val bounds = hashed
        .withColumn("cuts", expr("""
          filter(IF(l >= 9, sequence(2, l - 7), CAST(array() AS ARRAY<INT>)),
            i -> aggregate(sequence(0, 7), CAST(0 AS BIGINT),
                   (acc, k) -> acc + element_at(th, i + k)
                     * element_at(array(1L, 31L, 961L, 29791L, 923521L,
                         28629151L, 887503681L, 27512614111L), k + 1))
                 % 1048576 % 16 = 0)"""))
        .select(col("doc_id"), col("toks"), col("l"),
          expr("array_sort(array_union(array(1, l + 1), cuts))").as("b"))
        .localCheckpoint(true) // b materialized before the chunk lambda
      val base = bounds
        .withColumn("chunks", expr("""
          transform(sequence(1, size(b) - 1),
            j -> named_struct('start', element_at(b, j),
                   'len', element_at(b, j + 1) - element_at(b, j)))"""))
      val chunkRows = base
        .select(col("doc_id"), col("l"), col("toks"),
          explode(col("chunks")).as("ch"))
        .select(col("doc_id"), col("l"), col("ch.start").as("start"),
          col("ch.len").as("len"),
          md5(expr("concat_ws(' ', slice(toks, ch.start, ch.len))"))
            .as("h"))
      val freq = chunkRows.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
      chunkRows.join(freq, "h")
        .groupBy("doc_id")
        .agg(count(lit(1L)).as("n_chunks"),
          sum(when(col("nd") >= 2 && col("len") >= 4, 1L).otherwise(0L))
            .as("n_dup_chunks"),
          sum(when(col("nd") >= 2 && col("len") >= 4,
            col("len").cast("long")).otherwise(0L)).as("dup_tokens"),
          max(col("l").cast("long")).as("tot_tokens"))
        .withColumn("dup_ppm", expr("(dup_tokens * 1000000) div tot_tokens"))
        .orderBy("doc_id")
    },
    Some(s"""WITH base AS (
              SELECT doc_id, $duckTokens AS toks,
                     len($duckTokens) AS l,
                     list_transform($duckTokens,
                       t -> ${duckHex4("md5(t)")}) AS th
              FROM documents),
            cutd AS (
              SELECT doc_id, toks, l,
                     list_filter(
                       CASE WHEN l >= 9
                         THEN generate_series(2, CAST(l - 7 AS BIGINT))
                         ELSE CAST([] AS BIGINT[]) END,
                       i -> list_sum(list_transform(generate_series(0, 7),
                              k -> th[CAST(i + k AS INT)]
                                * [1, 31, 961, 29791, 923521, 28629151,
                                   887503681, 27512614111][CAST(k + 1
                                     AS INT)]))
                            % 1048576 % 16 = 0) AS cuts
              FROM base),
            bnd AS (
              SELECT doc_id, toks, l,
                     list_sort(list_distinct(
                       list_concat([CAST(1 AS BIGINT),
                                    CAST(l + 1 AS BIGINT)], cuts))) AS b
              FROM cutd),
            chunks AS (
              SELECT doc_id, l,
                     CAST(b[CAST(j AS INT)] AS BIGINT) AS start,
                     CAST(b[CAST(j + 1 AS INT)] - b[CAST(j AS INT)]
                       AS BIGINT) AS clen,
                     md5(array_to_string(list_slice(toks,
                       CAST(b[CAST(j AS INT)] AS INT),
                       CAST(b[CAST(j + 1 AS INT)] - 1 AS INT)), ' ')) AS h
              FROM (SELECT doc_id, toks, l, b,
                           unnest(generate_series(1,
                             CAST(len(b) - 1 AS BIGINT))) AS j
                    FROM bnd)),
            freq AS (
              SELECT h, count(DISTINCT doc_id) AS nd
              FROM chunks GROUP BY 1)
            SELECT c.doc_id,
                   CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN f.nd >= 2 AND c.clen >= 4
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
                   CAST(sum(CASE WHEN f.nd >= 2 AND c.clen >= 4
                     THEN c.clen ELSE 0 END) AS BIGINT) AS dup_tokens,
                   CAST(max(c.l) AS BIGINT) AS tot_tokens,
                   CAST((sum(CASE WHEN f.nd >= 2 AND c.clen >= 4
                     THEN c.clen ELSE 0 END)
                     * 1000000) // max(c.l) AS BIGINT) AS dup_ppm
            FROM chunks c JOIN freq f USING (h)
            GROUP BY 1 ORDER BY c.doc_id"""))

  // ------------------------------------------------ dedup-rate curve --

  /** Shingle-size dedup-rate curve — the knob-tuning diagnostic BEFORE
    * any dedup run: sweeping n ∈ {2, 3, 5}, what fraction of the
    * corpus's n-shingle mass is repeated (dup_ppm = (total−distinct)/
    * total) and how much of it repeats ACROSS documents (crossdoc_ppm =
    * mass of shingles with df ≥ 2)? Small n saturates (every bigram
    * repeats → over-aggressive dedup), large n under-triggers; the
    * crossdoc column is the actual near-dup signal the minhash family
    * keys on, separated from within-doc repetition (q_text_repetition's
    * axis). Same shingle grammar as the minhash block (short docs clip
    * to one shingle); all ratios exact ppm ints.
    *
    * Scale: three shingle explodes (linear in tokens, map-only) + one
    * (n, shingle) hash-agg carrying both the occurrence count and the
    * distinct-doc count, then a 3-row final agg — no joins, no windows;
    * the shingle agg is the same key distribution the dedup family
    * already shuffles, so the curve costs one pass of what the dedup it
    * tunes would cost.
    */
  private val qCorpusDedupCurve = GQuery(
    (s, d) => {
      // small-input parallelism guard (guide §2.5 input skew): documents
      // arrives as one small file at bench SF, so a bare scan would run
      // the whole triple explode + partial agg in ONE task (measured:
      // the one-pass rewrite below was +0.6 s single-task). Fan the scan
      // out to core count when (and only when) the scan itself has fewer
      // partitions — at real scale the scan has >= cores tasks and this
      // branch is a no-op, so nothing here is a local[32]-only constant.
      val raw = t(s, d, "documents").select(col("doc_id"), col("text"))
      val par = s.sparkContext.defaultParallelism
      val docs = (if (raw.rdd.getNumPartitions < par) raw.repartition(par)
                  else raw)
        .select(col("doc_id"), tokens.as("toks"))
      // ALL THREE shingle widths from ONE generator pass: the r12 form
      // union'd three explodes over a corpus-sized localCheckpoint (the
      // round's own "never corpus-sized" discipline violation — VERDICT
      // r12 §wrong #4). One explode of the concatenated per-width arrays
      // needs the tokenized corpus exactly once, so no barrier is needed:
      // `toks` stays a real projected attribute below the Generate (split
      // runs once per ROW, not per element — the generator expression
      // references the attribute, the q_text_phrase trigram precedent),
      // and union-of-explodes ≡ explode-of-concat under the (shingle_n,
      // sgl) groupBy.
      def shArr(n: Int) = transform(
        sequence(lit(1), greatest(size(col("toks")) - (n - 1), lit(1))),
        i => struct(lit(n.toLong).as("shingle_n"),
          concat_ws(" ", slice(col("toks"), i, lit(n))).as("sgl")))
      val g = docs
        .select(col("doc_id"),
          explode(concat(shArr(2), shArr(3), shArr(5))).as("e"))
        .select(col("e.shingle_n").as("shingle_n"), col("doc_id"),
          col("e.sgl").as("sgl"))
        .groupBy("shingle_n", "sgl")
        .agg(count(lit(1L)).as("cnt"), countDistinct("doc_id").as("ndocs"))
      g.groupBy("shingle_n")
        .agg(sum("cnt").as("total_shingles"),
          count(lit(1L)).as("n_distinct"),
          sum(when(col("ndocs") >= 2, col("cnt")).otherwise(0L)).as("xmass"))
        .select(col("shingle_n"), col("total_shingles"), col("n_distinct"),
          expr("((total_shingles - n_distinct) * 1000000)"
            + " div total_shingles").as("dup_ppm"),
          expr("(xmass * 1000000) div total_shingles").as("crossdoc_ppm"))
        .orderBy("shingle_n")
    },
    Some(s"""WITH docs AS (
              SELECT doc_id, $duckTokens AS toks FROM documents),
            sh AS (
              SELECT 2 AS shingle_n, doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(toks)-1, 1)),
                       i -> array_to_string(list_slice(toks, i, i+1), ' ')))
                       AS sgl
              FROM docs
              UNION ALL
              SELECT 3, doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(toks)-2, 1)),
                       i -> array_to_string(list_slice(toks, i, i+2), ' ')))
              FROM docs
              UNION ALL
              SELECT 5, doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(toks)-4, 1)),
                       i -> array_to_string(list_slice(toks, i, i+4), ' ')))
              FROM docs),
            g AS (
              SELECT shingle_n, sgl, CAST(count(*) AS BIGINT) AS cnt,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS ndocs
              FROM sh GROUP BY 1, 2)
            SELECT CAST(shingle_n AS BIGINT) AS shingle_n,
                   CAST(sum(cnt) AS BIGINT) AS total_shingles,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST((sum(cnt) - count(*)) * 1000000 // sum(cnt)
                     AS BIGINT) AS dup_ppm,
                   CAST(sum(CASE WHEN ndocs >= 2 THEN cnt ELSE 0 END)
                     * 1000000 // sum(cnt) AS BIGINT) AS crossdoc_ppm
            FROM g GROUP BY 1 ORDER BY 1"""))

  // ---------------------------------------------------- Bloom membership --

  /** Bloom-filter incremental exact-dedup — the constant-memory membership
    * rung UNDER the band-index (q_dedup_incremental keys history by LSH
    * band; when the question is only "seen this exact payload before?", a
    * Bloom bitmap of the history keys answers it in m bits with a
    * measurable false-positive rate and zero misses). k = 4 positions per
    * key from the 4 disjoint 4-hex-char slices of one md5 (the one-digest
    * multi-hash trick, q_dedup_minhash precedent), bitmap held as a
    * DISTINCT (m, position) table. Probes docs ≥ 400 against history
    * < 400 and sweeps m ∈ {1024, 4096, 16384}, emitting per m the maybe
    * count, the exact-dup truth, the false positives, and fp_ppm among
    * true negatives — the sizing curve (fp ≈ (1−e^(−kn/m))^k) read off
    * real data, next to bits_set as the fill gauge.
    *
    * Scale: history collapses to ≤ m distinct positions (map-combinable
    * distinct), broadcastable at any history size — the probe join never
    * shuffles the corpus; appends union new positions in without
    * rescanning history (band-index economics). The exact-truth side is
    * the audit anchor that drops at 100 TB, leaving filter + probe.
    */
  private val qDedupBloom = GQuery(
    (s, d) => {
      val ms = s.createDataFrame(Seq(Tuple1(1024L), Tuple1(4096L),
        Tuple1(16384L))).toDF("m")
      val docs = t(s, d, "documents")
        .select(col("doc_id"), md5(col("text")).as("h"))
        .localCheckpoint(true) // feeds history bitmap, probes, and exact truth
      val posArr = array((0 to 3).map(j =>
        conv(substring(col("h"), j * 4 + 1, 4), 16, 10).cast("long")): _*)
      val hist = docs.filter(col("doc_id") < 400)
      val bits = hist.crossJoin(broadcast(ms))
        .select(col("m"), explode(posArr).as("raw"))
        .select(col("m"), pmod(col("raw"), col("m")).as("p"))
        .distinct()
        .localCheckpoint(true) // feeds the probe join AND the fill gauge
      val fill = bits.groupBy("m").agg(count(lit(1L)).as("bits_set"))
      val probes = docs.filter(col("doc_id") >= 400)
        .crossJoin(broadcast(ms))
        .select(col("doc_id"), col("h"), col("m"), explode(posArr).as("raw"))
        .select(col("doc_id"), col("h"), col("m"),
          pmod(col("raw"), col("m")).as("p"))
      val perDoc = probes
        .join(bits.withColumn("hit", lit(1L)), Seq("m", "p"), "left")
        .groupBy("doc_id", "h", "m")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      val exact = hist.select(col("h")).distinct()
        .withColumn("isdup", lit(1L))
      perDoc.join(exact, Seq("h"), "left")
        .select(col("m"), (col("hits") === 4).cast("long").as("maybe"),
          coalesce(col("isdup"), lit(0L)).as("isdup"))
        .groupBy("m")
        .agg(count(lit(1L)).as("n_incoming"),
          sum("maybe").as("n_maybe"),
          sum("isdup").as("n_exact"),
          sum(col("maybe") * (lit(1L) - col("isdup"))).as("n_fp"))
        .join(fill, Seq("m"))
        // all-dup incoming batch ⇒ zero true negatives — fp rate undefined
        // (null), never a div-by-zero ANSI abort (q_corpus_temperature rule)
        .withColumn("fp_ppm",
          when(col("n_incoming") > col("n_exact"),
            expr("n_fp * 1000000 div (n_incoming - n_exact)")))
        .select(col("m"), col("n_incoming"), col("n_maybe"), col("n_exact"),
          col("n_fp"), col("fp_ppm"), col("bits_set"))
        .orderBy("m")
    },
    Some {
      val pos = duckHex4("substr(h, off, 4)")
      s"""WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
            js AS (SELECT unnest([1, 5, 9, 13]) AS off),
            ms AS (SELECT CAST(unnest([1024, 4096, 16384]) AS BIGINT) AS m),
            hist AS (SELECT * FROM d WHERE doc_id < 400),
            bits AS (
              SELECT DISTINCT ms.m, $pos % ms.m AS p
              FROM hist, js, ms),
            fill AS (SELECT m, CAST(count(*) AS BIGINT) AS bits_set
                     FROM bits GROUP BY 1),
            probes AS (
              SELECT doc_id, h, ms.m, $pos % ms.m AS p
              FROM d, js, ms WHERE doc_id >= 400),
            perdoc AS (
              SELECT pr.doc_id, pr.h, pr.m,
                     sum(CASE WHEN b.p IS NOT NULL THEN 1 ELSE 0 END) AS hits
              FROM probes pr
              LEFT JOIN bits b ON b.m = pr.m AND b.p = pr.p
              GROUP BY 1, 2, 3),
            ex AS (SELECT DISTINCT h FROM hist),
            flagged AS (
              SELECT pd.m,
                     CASE WHEN pd.hits = 4 THEN 1 ELSE 0 END AS maybe,
                     CASE WHEN ex.h IS NOT NULL THEN 1 ELSE 0 END AS isdup
              FROM perdoc pd LEFT JOIN ex ON ex.h = pd.h),
            agg AS (
              SELECT m, CAST(count(*) AS BIGINT) AS n_incoming,
                     CAST(sum(maybe) AS BIGINT) AS n_maybe,
                     CAST(sum(isdup) AS BIGINT) AS n_exact,
                     CAST(sum(maybe * (1 - isdup)) AS BIGINT) AS n_fp
              FROM flagged GROUP BY 1)
            SELECT agg.m, n_incoming, n_maybe, n_exact, n_fp,
                   CAST(CASE WHEN n_incoming > n_exact
                     THEN n_fp * 1000000 // (n_incoming - n_exact) END
                     AS BIGINT) AS fp_ppm,
                   bits_set
            FROM agg JOIN fill ON fill.m = agg.m ORDER BY agg.m"""
    })

  override val queries: Map[String, GQuery] = Map(
    "q_dedup_bloom" -> qDedupBloom,
    "q_corpus_dedup_curve" -> qCorpusDedupCurve,
    "q_dedup_cdc" -> qDedupCdc,
    "q_corpus_novelty" -> qCorpusNovelty,
    "q_dedup_containment" -> qDedupContainment,
    "q_eval_ngram_overlap" -> qEvalNgramOverlap,
    "q_dedup_lsh_tune" -> qDedupLshTune,
    "q_dedup_minhash_recall" -> qDedupMinhashRecall,
    "q_dedup_setjoin" -> qDedupSetjoin,
    "q_dedup_semantic" -> qDedupSemantic,
    "q_dedup_components" -> qDedupComponents,
    "q_dedup_keep" -> qDedupKeep,
    "q_dedup_keep_spans" -> qDedupKeepSpans,
    "q_dedup_minhash" -> qDedupMinhash,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_ngram_jaccard" -> qDedupNgramJaccard,
    "q_dedup_embed" -> qDedupEmbed,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_dedup_substring" -> qDedupSubstring,
    "q_decontaminate" -> qDecontaminate)
}
