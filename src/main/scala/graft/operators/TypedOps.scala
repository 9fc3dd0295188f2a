package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{GQuery, QueryModule, Tables}
import graft.Exact.{cents, dround}

/** Typed Dataset API block: the `Dataset[T]`/`Encoder` surface (SURVEY.md
  * §1.1 "Dataset[T] where type safety helps") — a custom typed `Aggregator`
  * registered as a UDAF, and `groupByKey.mapGroups` per-key imperative
  * aggregation. Both shuffle once on the group key like any aggregate; the
  * Aggregator gets map-side partial aggregation (reduce/merge), mapGroups
  * does not (documented trade-off — use it only when per-group logic can't
  * be expressed as an aggregate).
  */
object TypedOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Custom typed Aggregator: L2 norm of a group's values (√Σx²) — the
    * UDAF extension surface. reduce/merge are associative+commutative, so
    * Spark runs it partial-then-final exactly like a built-in.
    */
  val l2Agg: Aggregator[Double, Double, Double] = new Aggregator[Double, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, a: Double): Double = b + a * a
    def merge(b1: Double, b2: Double): Double = b1 + b2
    def finish(b: Double): Double = math.sqrt(b)
    def bufferEncoder: org.apache.spark.sql.Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: org.apache.spark.sql.Encoder[Double] = Encoders.scalaDouble
  }

  private val qAggUdaf = GQuery(
    (s, d) => {
      s.udf.register("graft_l2", udaf(l2Agg))
      t(s, d, "events")
        .groupBy("event_type")
        .agg(dround(expr("graft_l2(value)")).as("l2_val"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
                   CAST(round(CAST(sqrt(sum(value * value)) AS DECIMAL(30,8)), 2) AS DOUBLE) AS l2_val,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** groupByKey.mapGroups: per-user imperative pass over the sorted-free
    * iterator (count / max / min-id) — the escape hatch for group logic no
    * aggregate expresses. Outputs stay raw; rounding happens declaratively
    * after, so the SQL-vs-Scala rounding rules never meet.
    */
  private val qTypedMapgroups = GQuery(
    (s, d) => {
      val spark = s
      import spark.implicits._
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapGroups { (uid, it) =>
          var n = 0L
          var maxV = Double.NegativeInfinity
          var minId = Long.MaxValue
          it.foreach { case (_, id, v) =>
            n += 1
            if (v > maxV) maxV = v
            if (id < minId) minId = id
          }
          (uid, n, maxV, minId)
        }
        .toDF("user_id", "n", "max_val", "first_id")
        .select(col("user_id"), col("n"), dround(col("max_val")).as("max_val"),
          col("first_id"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   CAST(round(CAST(max(value) AS DECIMAL(30,8)), 2) AS DOUBLE) AS max_val,
                   min(event_id) AS first_id
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Case classes for the typed join — object-level so their Encoders
    * derive once.
    */
  final case class OrderRow(o_custkey: Long, cents: Long)
  final case class CustRow(c_custkey: Long, seg: String)

  /** `joinWith` + `reduceGroups`: the fully TYPED relational path —
    * Dataset[OrderRow] ⋈ Dataset[CustRow] yields Dataset[(OrderRow,
    * CustRow)] (both sides survive as typed objects, no Row casts), mapped
    * to (segment, cents, 1) and reduced per key. reduceGroups runs through
    * ReduceAggregator, so it gets map-side partial aggregation like any
    * built-in — the typed API costs an encoder round-trip per row here
    * (why the engine's default surface is columns), but loses nothing on
    * plan shape: same broadcast join, same partial-then-final agg. Cents
    * stay exact longs through the typed path; the oracle is the plain
    * relational twin.
    */
  private val qTypedJoinwith = GQuery(
    (s, d) => {
      val spark = s
      import spark.implicits._
      val od = t(s, d, "orders")
        // typed rows: a NULL o_custkey cannot deserialize into a Long
        // field (and the inner join would drop it anyway)
        .filter(col("o_custkey").isNotNull)
        .select(col("o_custkey"),
          cents(col("o_totalprice"))
            .as("cents"))
        .as[OrderRow]
      val cd = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("seg"))
        .as[CustRow]
      od.joinWith(cd, od("o_custkey") === cd("c_custkey"), "inner")
        .map { case (o, c) => (c.seg, o.cents, 1L) }
        .groupByKey(_._1)
        .reduceGroups((a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        .map { case (seg, (_, cents, n)) => (seg, n, cents) }
        .toDF("seg", "n_orders", "sum_cents")
        .orderBy("seg")
    },
    Some("""SELECT c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1 ORDER BY seg"""))

  override val queries: Map[String, GQuery] = Map(
    "q_agg_udaf" -> qAggUdaf,
    "q_typed_joinwith" -> qTypedJoinwith,
    "q_typed_mapgroups" -> qTypedMapgroups)
}
