package graft

import org.apache.spark.sql.functions._
import graft.functions.MultimodalOps

/** Multimodal plumbing (SURVEY.md north star): the binary-payload decode
  * pass — typed encoder schema, distributed execution, stub determinism.
  */
class MultimodalSpec extends SparkSpec {

  test("decode pass is distributed, typed, and deterministic") {
    val docs = Tables(spark, sf, "documents")
    val feats = MultimodalOps.decodeAll(docs)
    // schema comes from the case-class encoder
    assert(feats.toDF().columns.toSeq ==
      Seq("doc_id", "n_bytes", "head_sum", "tail_code", "fake_w", "fake_h"))
    assert(feats.count() == docs.count())
    // deterministic: two runs agree exactly
    val a = feats.toDF(); val b = MultimodalOps.decodeAll(docs).toDF()
    assert(a.exceptAll(b).count() == 0)
  }

  test("stub decoder handles empty payloads") {
    val f = MultimodalOps.decodeStub(7L, Array.emptyByteArray)
    assert(f == MultimodalOps.MediaFeatures(7L, 0L, 0L, 0, 0, 0))
  }

  test("features match the payload bytes (ASCII corpus: bytes == chars)") {
    val docs = Tables(spark, sf, "documents")
    val feats = MultimodalOps.decodeAll(docs).toDF()
    val joined = feats.join(docs, "doc_id")
      .filter(col("n_bytes") =!= col("n_chars"))
    assert(joined.count() == 0)
  }
}
