package graft

import org.apache.spark.sql.SparkSession

/** Dev-only cross-engine cast-semantics probe (not part of the driver
  * contract; the DuckDB twin lives in tools/fuzz_oracles.py --probe).
  *
  * Records the round-10 adversarial-cast experiment on boundary doubles
  * (shortest-repr x.xx5, binary-exact .125, negatives):
  *   - CAST(DOUBLE AS DECIMAL(18,2)) — Spark routes through the shortest
  *     decimal repr (BigDecimal.valueOf) then HALF_UP; DuckDB's direct
  *     cast measures identically (1.005 → 1.01, 0.125 → 0.13,
  *     2.675 → 2.68, -1.005 → -1.01 in BOTH). The cents pattern is safe.
  *   - round(DECIMAL(30,8), 2) — HALF_UP in both (dround twin safe).
  *   - CAST(DOUBLE AS BIGINT) — Spark truncates, DuckDB rounds half-even:
  *     the one divergent cast (fixed by the floor() sweep, CLAUDE.md).
  *   - DECIMAL(30,8) → DECIMAL(18,2) CAST (no round()) — Spark HALF_UP,
  *     DuckDB TRUNCATES (1.00500000 → 1.00): never rescale decimals by
  *     bare CAST in a twin; always round(dec, s) first.
  */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("""SELECT
      CAST(CAST(1.005 AS DOUBLE) AS DECIMAL(18,2))  AS d1005,
      CAST(CAST(0.125 AS DOUBLE) AS DECIMAL(18,2))  AS d0125,
      CAST(CAST(2.675 AS DOUBLE) AS DECIMAL(18,2))  AS d2675,
      CAST(CAST(-1.005 AS DOUBLE) AS DECIMAL(18,2)) AS dm1005,
      round(CAST(CAST(1.005 AS DOUBLE) AS DECIMAL(30,8)), 2) AS r1005,
      round(CAST(CAST(0.125 AS DOUBLE) AS DECIMAL(30,8)), 2) AS r0125,
      round(CAST(CAST(2.675 AS DOUBLE) AS DECIMAL(30,8)), 2) AS r2675,
      CAST(CAST(2.675 AS DOUBLE) AS BIGINT)  AS b2675,
      CAST(CAST(15.5 AS DOUBLE) AS BIGINT)   AS b155,
      CAST(CAST(-2.675 AS DOUBLE) AS BIGINT) AS bm2675,
      CAST(CAST(CAST(1.005 AS DOUBLE) AS DECIMAL(30,8)) AS DECIMAL(18,2))
        AS rescale1005
    """).show(false)
    spark.stop()
  }
}
