package graft

/** ANN recall gauges (the q_knn_recall harness applied across variants):
  * speed without recall is meaningless, and each recall lever must actually
  * lift the number it claims to lift.
  */
class SimilaritySpec extends SparkSpec {

  /** (p_id, n_id) pairs a query returns for the shared probe set. */
  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).select("p_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("re-ranking recall@3 >= multi-probe's on the same probes") {
    val truth = pairs("q_embed_knn")
    val multiprobe = pairs("q_knn_ivf_multiprobe").count(truth)
    val rerank = pairs("q_knn_rerank").count(truth)
    // the wider-but-cheap candidate net + exact re-scoring must not lose
    // recall vs the narrower exact multi-probe (VERDICT r3 done-criterion)
    assert(rerank >= multiprobe, s"rerank $rerank < multiprobe $multiprobe")
    // and the single-bucket IVF stays the lower bound of the ladder
    val single = pairs("q_knn_ivf").count(truth)
    assert(multiprobe >= single, s"multiprobe $multiprobe < single $single")
  }

  test("int8-quantized coarse pass keeps multi-probe-level recall@3") {
    val truth = pairs("q_embed_knn")
    val multiprobe = pairs("q_knn_ivf_multiprobe").count(truth)
    val quantized = pairs("q_knn_quantized").count(truth)
    // the quantized coarse scorer sees the full 64 dims (vs rerank's 16-dim
    // float truncation) at 1/8 the bytes — quantization noise must not cost
    // recall vs the narrower exact multi-probe
    assert(quantized >= multiprobe, s"quantized $quantized < multiprobe $multiprobe")
  }

  test("semantic clusters co-locate every surviving true-NN pair") {
    // SemDeDup's partition-quality proxy: a near-dup can only be FOUND if
    // the learned partition puts the pair in one cluster. Among the
    // brute-force truth pairs whose BOTH endpoints survive the cluster
    // cap, co-location must be total — the learned centroids adapt to the
    // corpus where a random SRP hyperplane splits neighbors (the
    // single-bucket SRP variant measures 0/15 on the same probes,
    // q_knn_ivf_multiprobe scaladoc). Measured at sf0.01: 6 of 15 truth
    // pairs survive, 6/6 co-locate.
    val truth = pairs("q_embed_knn")
    val cluster = SparkEntry.queries("q_dedup_semantic")(spark, sf)
      .select("a_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val surviving = truth.filter { case (p, n) =>
      cluster.contains(p) && cluster.contains(n) }
    assert(surviving.size >= 5, s"cap obliterated the truth pairs: $surviving")
    val colocated = surviving.count { case (p, n) => cluster(p) == cluster(n) }
    assert(colocated == surviving.size,
      s"only $colocated/${surviving.size} surviving truth pairs co-locate")
  }

  test("PQ tops the ladder: recall@3 >= int8-quantized at 1/8 its bytes") {
    val truth = pairs("q_embed_knn")
    val quantized = pairs("q_knn_quantized").count(truth)
    val pq = pairs("q_knn_pq").count(truth)
    // 8-byte PQ codes scan the whole code table (no candidate net → no net
    // misses) and re-rank exactly — must not lose recall to the 64-byte
    // int8 coarse pass behind its Hamming-≤2 net (VERDICT r4 done-criterion;
    // measured 13/15 vs 8/15 at sf0.01)
    assert(pq >= quantized, s"pq $pq < quantized $quantized")
  }

  test("IVF-PQ keeps centroid-IVF-level recall@3 at a fraction of the scan") {
    val truth = pairs("q_embed_knn")
    val ivf = pairs("q_knn_ivf_centroid").count(truth)
    val ivfpq = pairs("q_knn_ivfpq").count(truth)
    // restricting the PQ-ADC scan to the 2 visited IVF cells can only miss
    // what cell routing already missed — the 8-byte codes must not cost
    // recall vs the same cells scanned with full vectors
    assert(ivfpq >= ivf, s"ivfpq $ivfpq < centroid-ivf $ivf")
  }

  test("coreset centers are distinct and greedily distant") {
    val rows = SparkEntry.queries("q_sample_coreset")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).distinct.length == 5, "centers must be distinct")
    // each later pick covers a no-farther point: max-min distance shrinks
    val ds = rows.sortBy(_.getInt(0)).map(_.getLong(2)).drop(1)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, ds.mkString(","))
  }
}
