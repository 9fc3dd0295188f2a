package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, QueryModule, Tables}
import graft.Exact.dround

/** Text-analysis block (north-star training-data pipeline ops): token/char
  * statistics and prefix-shingle near-duplicate blocking over `documents`.
  * Everything is built-in string/array functions — codegen'd, no UDFs, fully
  * distributed (the group-bys shuffle on lang / shingle key, both low-card
  * or high-entropy — no driver-side logic anywhere).
  */
object TextOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Per-language corpus statistics: doc counts, char/token means, max len. */
  private val qTextStats = GQuery(
    (s, d) => t(s, d, "documents")
      .select(col("lang"), col("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        dround(avg(col("n_chars").cast("double"))).as("avg_chars"),
        dround(avg(col("n_tokens").cast("double"))).as("avg_tokens"),
        max("n_chars").as("max_chars"))
      .orderBy("lang"),
    Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(round(CAST(avg(CAST(n_chars AS DOUBLE)) AS DECIMAL(30,8)), 2) AS DOUBLE) AS avg_chars,
                   CAST(round(CAST(avg(CAST(len(string_split(text, ' ')) AS DOUBLE)) AS DECIMAL(30,8)), 2) AS DOUBLE) AS avg_tokens,
                   max(n_chars) AS max_chars
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** Near-dup blocking on the lowercase first-5-token shingle: groups with
    * >1 doc are duplicate candidates. The group-by formulation (vs a
    * self-join emitting pairs) keeps output linear in corpus size — at 100 TB
    * a hot shingle would otherwise explode quadratically.
    */
  private val qTextShingleDup = GQuery(
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        array_join(slice(split(lower(col("text")), " "), 1, 5), " ").as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .filter(col("n_docs") > 1)
      .orderBy("prefix"),
    Some("""SELECT array_to_string(list_slice(string_split(lower(text), ' '), 1, 5), ' ')
                     AS prefix,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY prefix"""))

  override val queries: Map[String, GQuery] = Map(
    "q_text_stats" -> qTextStats,
    "q_text_shingle_dup" -> qTextShingleDup)
}
