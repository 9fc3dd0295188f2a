package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by modules (operators/functions/streaming); each
  * carries its DuckDB oracle SQL alongside the Spark implementation (GQuery).
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.RelationalExt,
    operators.AnalyticsOps,
    operators.GraphOps,
    operators.PipelineOps,
    operators.DedupOps,
    operators.TypedOps,
    operators.ScoringOps,
    operators.GovernanceOps,
    functions.TextOps,
    functions.SimilarityOps,
    functions.MultimodalOps)

  /** name → query registry; names are the t2 contract (SURVEY.md §2.3). */
  lazy val registry: Map[String, GQuery] = {
    val all = modules.flatMap(_.queries.toSeq)
    require(all.map(_._1).distinct.size == all.size, "duplicate query names")
    all.toMap
  }

  /** Flagship pipeline on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * This is the reference's whole job, Spark-natively (SURVEY.md §7 step 1).
    */
  def entry(spark: SparkSession): DataFrame =
    streaming.Flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, GQuery(_, Some(sql), _)) => k -> sql }
}
