package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GQuery, QueryModule, Tables}
import graft.Exact.cents

/** Round-6 governance block: the data-contract and privacy-audit surface a
  * training-data platform wraps around ingestion — declarative expectation
  * rules (the dbt-test / Great-Expectations shape) evaluated in one pass,
  * and an l-diversity audit complementing q_privacy_kanon's k-anonymity
  * ladder.
  *
  * House rules as everywhere: built-ins only, fixed-point integers on every
  * fractional output, total-order ORDER BY (SURVEY.md §7).
  */
object GovernanceOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  // ------------------------------------------- expectation-rule contract --

  /** Declarative data-contract validation over `orders`: five expectation
    * rules (not-null, numeric range, categorical domain, regex format, key
    * uniqueness) evaluated in ONE aggregation pass — each rule is a
    * conditional count inside the same agg, so adding rules never adds
    * scans. Uniqueness rides the same pass as `count − count(distinct key)`.
    * Output: one row per rule with violation count and pass flag.
    *
    * Scale: a single map-side-combinable agg over the table (the distinct
    * for the uniqueness rule is the only expansion, and it is on the
    * table's own primary key — already near-unique, so the partial
    * distinct collapses immediately). The rule table is code here; a
    * deployment would broadcast it and generate the same conditional
    * columns.
    */
  private val qQualityExpectations = GQuery(
    (s, d) => {
      val o = t(s, d, "orders")
      val agg = o.agg(
        count(lit(1L)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("v_notnull"),
        sum(when(col("o_totalprice") < 0 || col("o_totalprice") > 600000, 1L)
          .otherwise(0L)).as("v_range"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .as("v_domain"),
        sum(when(!col("o_orderpriority").rlike("^[1-5]-"), 1L).otherwise(0L))
          .as("v_format"),
        (count(lit(1L)) - countDistinct(col("o_orderkey"))).as("v_unique"))
      agg.selectExpr(
        """stack(5,
             'not_null_custkey',   v_notnull,
             'range_totalprice',   v_range,
             'domain_orderstatus', v_domain,
             'format_priority',    v_format,
             'unique_orderkey',    v_unique) AS (rule_id, n_violations)""",
        "n_rows")
        .select(col("rule_id"), col("n_rows"), col("n_violations"),
          (col("n_violations") === 0L).as("passed"))
        .orderBy("rule_id")
    },
    Some("""WITH agg AS (
              SELECT CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS v_notnull,
                     CAST(sum(CASE WHEN o_totalprice < 0 OR o_totalprice > 600000
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
                     CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_domain,
                     CAST(sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_format,
                     CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                       AS v_unique
              FROM orders),
            rules AS (
              SELECT t.rule_id, agg.n_rows, t.n_violations
              FROM agg, LATERAL (VALUES
                ('not_null_custkey', v_notnull),
                ('range_totalprice', v_range),
                ('domain_orderstatus', v_domain),
                ('format_priority', v_format),
                ('unique_orderkey', v_unique)) AS t(rule_id, n_violations))
            SELECT rule_id, n_rows, n_violations,
                   n_violations = 0 AS passed
            FROM rules ORDER BY rule_id"""))

  // ------------------------------------------------------- l-diversity --

  /** l-diversity audit over the `events` quasi-identifier (event_type,
    * hour-of-day): per equivalence class, l = #distinct users (the
    * sensitive attribute); classes below l<10 are re-identification risks
    * even when k-anonymous (everyone in the class maps to few people).
    * Emits the class-size/diversity ladder: per l-band, class count, row
    * coverage, and min observed l — the privacy-review summary table.
    *
    * Scale: one (QI → count, distinct-count) agg — the distinct is over
    * users WITHIN a class (map-side partial distinct on the QI key), then
    * metadata-sized band re-aggregation, exactly q_privacy_kanon's ladder
    * economics.
    */
  private val qPrivacyLdiv = GQuery(
    (s, d) => {
      val classes = t(s, d, "events")
        .select(col("event_type"), hour(col("ts")).as("hod"), col("user_id"))
        .groupBy("event_type", "hod")
        .agg(count(lit(1L)).as("n_rows"),
          countDistinct(col("user_id")).as("l"))
      classes
        .withColumn("l_band",
          when(col("l") < 10, "risk_lt10")
            .when(col("l") < 50, "low_10_49")
            .otherwise("diverse_50plus"))
        .groupBy("l_band")
        .agg(count(lit(1L)).as("n_classes"),
          sum("n_rows").as("n_rows"),
          min("l").as("min_l"), max("l").as("max_l"))
        .orderBy("l_band")
    },
    Some("""WITH classes AS (
              SELECT event_type, CAST(hour(ts) AS INT) AS hod,
                     CAST(count(*) AS BIGINT) AS n_rows,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS l
              FROM events GROUP BY 1, 2)
            SELECT CASE WHEN l < 10 THEN 'risk_lt10'
                        WHEN l < 50 THEN 'low_10_49'
                        ELSE 'diverse_50plus' END AS l_band,
                   CAST(count(*) AS BIGINT) AS n_classes,
                   CAST(sum(n_rows) AS BIGINT) AS n_rows,
                   CAST(min(l) AS BIGINT) AS min_l,
                   CAST(max(l) AS BIGINT) AS max_l
            FROM classes GROUP BY 1 ORDER BY 1"""))

  // ----------------------------------------------- score calibration --

  /** Calibration / reliability table for a purchase "score" (events.value
    * scaled to p̂ = value/500 as the predicted probability): fixed $50
    * score bins, per bin the mean predicted probability vs the observed
    * purchase rate, gap, and a final expected-calibration-error row
    * (bin = −1) — Σ n_b·|gap| div N. All fixed-point ppm over exact cents,
    * so the t2 gate hashes integers.
    *
    * Scale: one map-side-combinable agg to ≤10 bin rows; the ECE row
    * re-aggregates the bin table (metadata-sized). The companion metric to
    * q_stats_auc: AUC ranks, calibration checks the probabilities
    * themselves.
    */
  private val qStatsCalibration = GQuery(
    (s, d) => {
      val cents = graft.Exact.cents(col("value"))
      val bins = t(s, d, "events")
        .select(cents.as("c"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        .withColumn("bin", expr("c div 5000").cast("int"))
        .groupBy("bin")
        .agg(count(lit(1L)).as("n"), sum("pos").as("n_pos"), sum("c").as("sc"))
        .select(col("bin"), col("n"), col("n_pos"),
          // p̂ ppm: cents/50000 per row, averaged exactly over the bin
          expr("sc * 20 div n").as("avg_phat_ppm"),
          expr("n_pos * 1000000 div n").as("pos_rate_ppm"))
        .withColumn("gap_ppm",
          abs(col("avg_phat_ppm") - col("pos_rate_ppm")))
      val ece = bins.agg(sum("n").as("nt"), sum("n_pos").as("npt"),
          sum(col("n") * col("gap_ppm")).as("wg"))
        .select(lit(-1).cast("int").as("bin"), col("nt").as("n"),
          col("npt").as("n_pos"), lit(0L).as("avg_phat_ppm"),
          lit(0L).as("pos_rate_ppm"), expr("wg div nt").as("gap_ppm"))
      bins.unionAll(ece).orderBy("bin")
    },
    Some("""WITH ev AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS c,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
              FROM events),
            bins AS (
              SELECT CAST(c // 5000 AS INT) AS bin,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(pos) AS BIGINT) AS n_pos,
                     CAST(sum(c) AS BIGINT) AS sc
              FROM ev GROUP BY 1),
            b2 AS (
              SELECT bin, n, n_pos,
                     CAST(sc * 20 // n AS BIGINT) AS avg_phat_ppm,
                     CAST(n_pos * 1000000 // n AS BIGINT) AS pos_rate_ppm,
                     CAST(abs(sc * 20 // n - n_pos * 1000000 // n) AS BIGINT)
                       AS gap_ppm
              FROM bins),
            ece AS (
              SELECT CAST(-1 AS INT) AS bin, CAST(sum(n) AS BIGINT) AS n,
                     CAST(sum(n_pos) AS BIGINT) AS n_pos,
                     CAST(0 AS BIGINT) AS avg_phat_ppm,
                     CAST(0 AS BIGINT) AS pos_rate_ppm,
                     CAST(sum(n * gap_ppm) // sum(n) AS BIGINT) AS gap_ppm
              FROM b2)
            SELECT * FROM b2
            UNION ALL SELECT * FROM ece
            ORDER BY bin"""))

  // ------------------------------------------ Brier decomposition --

  /** Brier score with the Murphy (1973) decomposition — the single-number
    * summary q_stats_calibration's reliability TABLE rolls up to, split
    * into its three causes: BS = REL − RES + UNC (reliability: how far
    * bin forecasts sit from bin outcomes; resolution: how much the bins
    * separate from the base rate; uncertainty: the irreducible ȳ(1−ȳ)).
    * Same score (p̂ = value/500) and $50 bins as the calibration twin.
    * EVERYTHING is exact integer ppm² arithmetic: the direct Brier sums
    * (c·20 − y·10⁶)² per row (p̂ in ppm is EXACTLY c·20 — no division),
    * the decomposition uses the truncated integer-div bin means (p̄, ȳ_b,
    * ȳ in ppm), and the emitted `decomp_gap_ppm2` carries the exact
    * integer residual the binning + truncation leaves between BS and
    * REL−RES+UNC (zero only for perfectly bin-constant forecasts — the
    * within-bin-variance term, a diagnostic in itself). DECIMAL(38) sums
    * (squares reach 10¹² per row).
    *
    * Scale: one map-combinable bin agg carrying the row-level square sum;
    * everything after is ≤10 bin rows + a 1-row broadcast.
    */
  private val qStatsBrier = GQuery(
    (s, d) => {
      val cents = graft.Exact.cents(col("value"))
      val bins = t(s, d, "events")
        .select(cents.as("c"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
        .withColumn("bin", expr("c div 5000").cast("int"))
        .groupBy("bin")
        .agg(count(lit(1L)).as("n"), sum("pos").as("n_pos"),
          sum("c").as("sc"),
          sum(expr("""CAST(c * 20 - pos * 1000000 AS DECIMAL(38,0))
                      * (c * 20 - pos * 1000000)""")).as("sbs"))
        .withColumn("pbar", expr("sc * 20 div n"))
        .withColumn("ybar_b", expr("n_pos * 1000000 div n"))
      val glob = bins.agg(sum("n").as("nt"), sum("n_pos").as("npt"))
        .withColumn("ybar", expr("npt * 1000000 div nt"))
        .withColumn("j", lit(1))
      bins.withColumn("j", lit(1)).join(broadcast(glob), "j")
        .groupBy("nt", "npt", "ybar")
        .agg(sum("sbs").as("bsn"),
          sum(expr("""CAST(n AS DECIMAL(38,0)) * (pbar - ybar_b)
                      * (pbar - ybar_b)""")).as("reln"),
          sum(expr("""CAST(n AS DECIMAL(38,0)) * (ybar_b - ybar)
                      * (ybar_b - ybar)""")).as("resn"))
        .select(col("nt").as("n"),
          expr("CAST(bsn div nt AS BIGINT)").as("brier_ppm2"),
          expr("CAST(reln div nt AS BIGINT)").as("rel_ppm2"),
          expr("CAST(resn div nt AS BIGINT)").as("res_ppm2"),
          expr("ybar * (1000000 - ybar)").as("unc_ppm2"))
        .withColumn("decomp_gap_ppm2",
          col("brier_ppm2") -
            (col("rel_ppm2") - col("res_ppm2") + col("unc_ppm2")))
    },
    Some("""WITH ev AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS c,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS pos
              FROM events),
            bins AS (
              SELECT CAST(c // 5000 AS INT) AS bin,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(pos) AS BIGINT) AS n_pos,
                     CAST(sum(c) AS BIGINT) AS sc,
                     sum(CAST(c * 20 - pos * 1000000 AS HUGEINT)
                         * (c * 20 - pos * 1000000)) AS sbs
              FROM ev GROUP BY 1),
            b2 AS (
              SELECT bin, n, n_pos, sc, sbs,
                     sc * 20 // n AS pbar,
                     n_pos * 1000000 // n AS ybar_b
              FROM bins),
            gtot AS (
              SELECT CAST(sum(n) AS BIGINT) AS nt,
                     CAST(sum(n_pos) AS BIGINT) AS npt,
                     sum(n_pos) * 1000000 // sum(n) AS ybar
              FROM bins),
            agg AS (
              SELECT g.nt, g.npt, g.ybar,
                     sum(b.sbs) AS bsn,
                     sum(CAST(b.n AS HUGEINT) * (b.pbar - b.ybar_b)
                         * (b.pbar - b.ybar_b)) AS reln,
                     sum(CAST(b.n AS HUGEINT) * (b.ybar_b - g.ybar)
                         * (b.ybar_b - g.ybar)) AS resn
              FROM b2 b, gtot g GROUP BY 1, 2, 3)
            SELECT nt AS n,
                   CAST(bsn // nt AS BIGINT) AS brier_ppm2,
                   CAST(reln // nt AS BIGINT) AS rel_ppm2,
                   CAST(resn // nt AS BIGINT) AS res_ppm2,
                   CAST(ybar * (1000000 - ybar) AS BIGINT) AS unc_ppm2,
                   CAST((bsn // nt)
                     - ((reln // nt) - (resn // nt)
                        + ybar * (1000000 - ybar)) AS BIGINT)
                     AS decomp_gap_ppm2
            FROM agg"""))

  // ------------------------------------------------ continuity audit --

  /** Gaps-and-islands continuity audit over per-user event_id sequences —
    * the "did the exactly-once pipeline actually lose anything" check (the
    * reference world's offset-gap detector, applied to the event log): an
    * island is a maximal run of consecutive ids, found with the classic
    * id − row_number() grouping key; a gap between islands is missing
    * data. Emits per user: event count, island count, the largest gap, and
    * the id span — a clean feed for an alerting rule (n_islands > 1 ⇒
    * investigate).
    *
    * Scale: one user-partitioned window (rows sort within user partitions
    * only) + one partial-agg rollup — sessionize economics; a hot user
    * takes the stop-block cap.
    */
  private val qEventsGaps = GQuery(
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val isl = t(s, d, "events")
        .select(col("user_id"), col("event_id"))
        .withColumn("isl", col("event_id") - row_number().over(w))
        .withColumn("prev", lag(col("event_id"), 1).over(w))
      isl.groupBy("user_id")
        .agg(count(lit(1L)).as("n_events"),
          countDistinct(col("isl")).as("n_islands"),
          max(when(col("prev").isNotNull,
            col("event_id") - col("prev") - 1L).otherwise(0L)).as("max_gap"),
          min("event_id").as("min_id"), max("event_id").as("max_id"))
        .orderBy("user_id")
    },
    Some("""WITH isl AS (
              SELECT user_id, event_id,
                     event_id - row_number() OVER (PARTITION BY user_id
                       ORDER BY event_id) AS isl,
                     lag(event_id, 1) OVER (PARTITION BY user_id
                       ORDER BY event_id) AS prev
              FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT isl) AS BIGINT) AS n_islands,
                   CAST(max(CASE WHEN prev IS NOT NULL
                     THEN event_id - prev - 1 ELSE 0 END) AS BIGINT) AS max_gap,
                   CAST(min(event_id) AS BIGINT) AS min_id,
                   CAST(max(event_id) AS BIGINT) AS max_id
            FROM isl GROUP BY user_id ORDER BY user_id"""))

  // --------------------------------------------------- Benford screen --

  /** Benford first-significant-digit screen on order totals — the classic
    * fabricated-numbers detector (synthetic or copy-pasted value columns
    * fail it; organic heavy-tailed ones pass): observed first-digit
    * frequencies in ppm vs the Benford expectation log₁₀(1+1/d), quantized
    * to ppm literals that sum to exactly 10⁶ (both engines compare the
    * SAME constants, so the op is integer-exact). Emits per digit
    * n/obs/exp/|dev| plus a digit = −1 total-variation summary row
    * (Σ|dev| div 2).
    *
    * Scale: one map-side-combinable 9-row digit agg; the first digit comes
    * from the cents integer (scale shifts never change the leading
    * significant digit), so no string parsing of doubles is on the path.
    */
  private val qStatsBenford = GQuery(
    (s, d) => {
      val exp = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
        57992L, 51153L, 45757L)
      val cents = graft.Exact.cents(col("o_totalprice"))
      val expCol = exp.zipWithIndex.foldLeft(lit(0L)) { case (acc, (p, i)) =>
        when(col("digit") === (i + 1), p).otherwise(acc)
      }
      // Domain guard: cents <= 0 has no Benford first digit — digit '0'
      // would silently diverge between engines (Spark keeps it with
      // exp_ppm=0; the oracle's INNER JOIN drops it) and a negative total
      // would ANSI-throw on the '-' substring cast. Filter on both sides.
      val digits = t(s, d, "orders")
        .select(cents.as("cents")).filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1L)).as("n"))
      val tot = digits.agg(sum("n").as("nt"))
      val scored = digits.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("n * 1000000 div nt").as("obs_ppm"),
          expCol.as("exp_ppm"))
        .withColumn("dev_ppm", abs(col("obs_ppm") - col("exp_ppm")))
      val summary = scored.agg(sum("n").as("n"), sum("dev_ppm").as("sd"))
        .select(lit(-1).cast("int").as("digit"), col("n"),
          lit(0L).as("obs_ppm"), lit(0L).as("exp_ppm"),
          expr("sd div 2").as("dev_ppm"))
      scored.unionAll(summary).orderBy("digit")
    },
    Some("""WITH cents AS (
              SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                       AS c
              FROM orders),
            digits AS (
              SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit,
                     CAST(count(*) AS BIGINT) AS n
              FROM cents WHERE c > 0 GROUP BY 1),
            tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM digits),
            exp AS (SELECT * FROM (VALUES (1, 301030), (2, 176091),
                      (3, 124939), (4, 96910), (5, 79181), (6, 66947),
                      (7, 57992), (8, 51153), (9, 45757)) AS t(digit, exp_ppm)),
            scored AS (
              SELECT d.digit, d.n,
                     CAST(d.n * 1000000 // t.nt AS BIGINT) AS obs_ppm,
                     CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
                     CAST(abs(d.n * 1000000 // t.nt - e.exp_ppm) AS BIGINT)
                       AS dev_ppm
              FROM digits d CROSS JOIN tot t JOIN exp e ON e.digit = d.digit),
            summary AS (
              SELECT CAST(-1 AS INT) AS digit, CAST(sum(n) AS BIGINT) AS n,
                     CAST(0 AS BIGINT) AS obs_ppm, CAST(0 AS BIGINT) AS exp_ppm,
                     CAST(sum(dev_ppm) // 2 AS BIGINT) AS dev_ppm
              FROM scored)
            SELECT * FROM scored UNION ALL SELECT * FROM summary
            ORDER BY digit"""))

  // -------------------------------------------- differential privacy --

  /** ε-differentially-private count release (Laplace mechanism) per
    * event_type — the DP member of the governance family: k-anonymity and
    * l-diversity audit the data; this is the mechanism that releases an
    * aggregate with a privacy budget (ε = 0.5, sensitivity 1 for a count,
    * so noise ~ Laplace(b = 2)).
    *
    * Determinism: the noise draw is the engine's hash-seeded-randomness
    * idiom (bootstrap's Poisson weights) — u comes from md5(key) as the
    * exact rational (2·u16 + 1)/131072 ∈ (0,1), and the Laplace inverse CDF
    * −b·sign(u−½)·ln(1−2|u−½|) evaluates on identical exact operands with
    * mirrored parenthesization (the corrmatrix fp rule), quantized to
    * milli-counts. Per-key seeding makes the release REPLAYABLE — same
    * data, same budget, same release — which is how a DP release pipeline
    * is audited. The true count is emitted here ONLY for the t2 gate;
    * a production release ships released_milli alone.
    *
    * Scale: one partial-agg count per key; the mechanism is per-GROUP
    * arithmetic on the ≤ |keys| aggregate — free at any corpus size.
    */
  /** DP release CONSISTENCY post-processing (Hay et al.'s boosting idea in
    * its simplest published form): raw Laplace-noised counts can go
    * negative and never sum to the public total, so a release pipeline
    * clamps at zero and re-apportions to the exactly-released invariant
    * total — here by LARGEST-REMAINDER (Hamilton) apportionment, the
    * classic exact-integer method: quota_i = ⌊T·c_i/Σc⌋ and the T − Σquota
    * leftover units go to the largest remainders (ties by key). Everything
    * after the noise draw is exact BIGINT arithmetic, so consistency
    * (Σ = T, all ≥ 0, integers) holds by construction and hashes
    * cross-engine. Post-processing costs no extra privacy budget — the
    * whole point of doing repair AFTER the mechanism. Noise is the
    * replayable hash-seeded Laplace of q_privacy_dp (independent seed tag).
    *
    * Scale: per-key arithmetic on the ≤ |keys| aggregate + two 1-row
    * totals + a |keys|-row remainder rank — free at any corpus size.
    */
  private val qPrivacyDpConsistent = GQuery(
    (s, d) => {
      val counts = t(s, d, "events")
        .groupBy("event_type").agg(count(lit(1L)).as("n_true"))
      val u16 = conv(substring(md5(concat(col("event_type"), lit(":dpc"))),
        1, 4), 16, 10).cast("long")
      val dev = abs(u16 * 2 + 1 - 65536L)
      val mag = lit(-2.0) * log((lit(131072L) - dev * 2).cast("double") / 131072.0)
      val noise = when(u16 * 2 + 1 >= 65536L, mag).otherwise(-mag)
      val cl = counts
        .withColumn("noisy_milli",
          col("n_true") * 1000 + round(noise * 1000).cast("long"))
        .withColumn("c", greatest(col("noisy_milli"), lit(0L)))
        .localCheckpoint(true) // feeds totals, quotas, and the rank
      val tot = cl.agg(sum("c").as("sc"), sum("n_true").as("tt"))
      val q = cl.crossJoin(broadcast(tot))
        .withColumn("quota", expr("(tt * c) div sc"))
        .withColumn("rem", expr("(tt * c) % sc"))
      val sq = q.agg(sum("quota").as("sq"), max("tt").as("t2"))
      val wRem = Window.orderBy(col("rem").desc, col("event_type").asc)
      q.crossJoin(broadcast(sq))
        .withColumn("rk", row_number().over(wRem))
        .withColumn("consistent",
          col("quota") + (col("rk") <= col("t2") - col("sq")).cast("long"))
        .select(col("event_type"), col("n_true"), col("noisy_milli"),
          col("consistent"),
          (col("consistent") - col("n_true")).as("err"))
        .orderBy("event_type")
    },
    Some(s"""WITH c AS (
               SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
               FROM events GROUP BY 1),
             u AS (
               SELECT event_type, n_true,
                      ${DedupOps.duckHex4("md5(event_type || ':dpc')")} AS u16
               FROM c),
             nz AS (
               SELECT event_type, n_true,
                      n_true * 1000 + CAST(round((CASE WHEN u16 * 2 + 1 >= 65536
                          THEN -2.0 * ln(CAST(131072 - abs(u16 * 2 + 1 - 65536)
                            * 2 AS DOUBLE) / 131072.0)
                          ELSE 2.0 * ln(CAST(131072 - abs(u16 * 2 + 1 - 65536)
                            * 2 AS DOUBLE) / 131072.0) END) * 1000) AS BIGINT)
                        AS noisy_milli
               FROM u),
             cl AS (
               SELECT event_type, n_true, noisy_milli,
                      greatest(noisy_milli, 0) AS c
               FROM nz),
             tot AS (SELECT CAST(sum(c) AS BIGINT) AS sc,
                            CAST(sum(n_true) AS BIGINT) AS tt FROM cl),
             q AS (
               SELECT event_type, n_true, noisy_milli,
                      CAST((tt * c) // sc AS BIGINT) AS quota,
                      CAST((tt * c) % sc AS BIGINT) AS rem
               FROM cl, tot),
             sq AS (SELECT CAST(sum(quota) AS BIGINT) AS sq,
                           max(tt) AS t2 FROM q, tot),
             rk AS (
               SELECT q.*, sq.sq, sq.t2,
                      row_number() OVER (ORDER BY rem DESC, event_type ASC)
                        AS rk
               FROM q, sq)
             SELECT event_type, n_true, noisy_milli,
                    CAST(quota + CASE WHEN rk <= t2 - sq THEN 1 ELSE 0 END
                      AS BIGINT) AS consistent,
                    CAST(quota + CASE WHEN rk <= t2 - sq THEN 1 ELSE 0 END
                      - n_true AS BIGINT) AS err
             FROM rk ORDER BY event_type"""))

  private val qPrivacyDp = GQuery(
    (s, d) => {
      val counts = t(s, d, "events")
        .groupBy("event_type").agg(count(lit(1L)).as("n_true"))
      val u16 = conv(substring(md5(concat(col("event_type"), lit(":dp1"))),
        1, 4), 16, 10).cast("long")
      val dev = abs(u16 * 2 + 1 - 65536L) // |2u−1| numerator over 131072
      val mag = lit(-2.0) * log((lit(131072L) - dev * 2).cast("double") / 131072.0)
      val noise = when(u16 * 2 + 1 >= 65536L, mag).otherwise(-mag)
      counts
        .withColumn("noise_milli", round(noise * 1000).cast("long"))
        .select(col("event_type"), col("n_true"), col("noise_milli"),
          (col("n_true") * 1000 + col("noise_milli")).as("released_milli"))
        .orderBy("event_type")
    },
    Some(s"""WITH c AS (
               SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
               FROM events GROUP BY 1),
             u AS (
               SELECT event_type, n_true,
                      ${DedupOps.duckHex4("md5(event_type || ':dp1')")} AS u16
               FROM c),
             nz AS (
               SELECT event_type, n_true,
                      CAST(round((CASE WHEN u16 * 2 + 1 >= 65536
                          THEN -2.0 * ln(CAST(131072 - abs(u16 * 2 + 1 - 65536) * 2
                            AS DOUBLE) / 131072.0)
                          ELSE 2.0 * ln(CAST(131072 - abs(u16 * 2 + 1 - 65536) * 2
                            AS DOUBLE) / 131072.0) END) * 1000) AS BIGINT)
                        AS noise_milli
               FROM u)
             SELECT event_type, n_true, noise_milli,
                    n_true * 1000 + noise_milli AS released_milli
             FROM nz ORDER BY event_type"""))

  /** ε-DP MEAN release with bounded user contribution — the mechanism rung
    * above q_privacy_dp's count: a mean's sensitivity is unbounded until
    * each USER's total contribution is CLAMPED (here to C = 10000 cents),
    * the step naive "add noise to the average" implementations skip and
    * the reason DP-SQL engines make contribution bounding explicit. Per
    * event type: per-user cents totals clamp to [0, C], the clamped SUM
    * gets Laplace(b = C/ε) noise (ε = 0.5 → b = 20000 cents) via the
    * engine's hash-seeded replayable draw (the q_privacy_dp idiom —
    * md5-derived exact rational, mirrored inverse-CDF chain, milli-cent
    * quantization), and the released mean divides the noisy sum by the
    * user count. The clamp-hit count is emitted as the utility audit
    * (how much signal the bound cost); true values ride along ONLY for
    * the t2 gate.
    *
    * Scale: one (type, user) partial agg + one per-type agg; the mechanism
    * is per-GROUP arithmetic on the ≤ |keys| aggregate — free at any
    * corpus size, and the per-user rollup is the same pass a contribution-
    * bounded DP-SQL engine runs.
    */
  private val qPrivacyDpMean = GQuery(
    (s, d) => {
      val cents = graft.Exact.cents(col("value"))
      val users = t(s, d, "events")
        .select(col("event_type"), col("user_id"), cents.as("v"))
        .groupBy("event_type", "user_id").agg(sum("v").as("uv"))
      val g = users.groupBy("event_type")
        .agg(count(lit(1L)).as("n_users"),
          sum(least(col("uv"), lit(10000L))).as("sum_clamped"),
          sum(when(col("uv") > 10000L, 1L).otherwise(0L)).as("n_clamped"))
      val u16 = conv(substring(md5(concat(col("event_type"), lit(":dpm"))),
        1, 4), 16, 10).cast("long")
      val dev = abs(u16 * 2 + 1 - 65536L)
      val mag = lit(-20000.0) *
        log((lit(131072L) - dev * 2).cast("double") / 131072.0)
      val noise = when(u16 * 2 + 1 >= 65536L, mag).otherwise(-mag)
      g.withColumn("noise_milli", round(noise * 1000).cast("long"))
        .select(col("event_type"), col("n_users"), col("n_clamped"),
          col("sum_clamped"),
          expr("sum_clamped * 1000 div n_users").as("mean_true_milli"),
          col("noise_milli"),
          expr("(sum_clamped * 1000 + noise_milli) div n_users")
            .as("mean_released_milli"))
        .orderBy("event_type")
    },
    Some(s"""WITH users AS (
               SELECT event_type, user_id,
                      CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS uv
               FROM events GROUP BY 1, 2),
             g AS (
               SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
                      CAST(sum(least(uv, 10000)) AS BIGINT) AS sum_clamped,
                      CAST(sum(CASE WHEN uv > 10000 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_clamped
               FROM users GROUP BY 1),
             u AS (
               SELECT *, ${DedupOps.duckHex4("md5(event_type || ':dpm')")}
                        AS u16
               FROM g),
             nz AS (
               SELECT event_type, n_users, n_clamped, sum_clamped,
                      CAST(round((CASE WHEN u16 * 2 + 1 >= 65536
                          THEN -20000.0 * ln(CAST(131072
                            - abs(u16 * 2 + 1 - 65536) * 2
                            AS DOUBLE) / 131072.0)
                          ELSE 20000.0 * ln(CAST(131072
                            - abs(u16 * 2 + 1 - 65536) * 2
                            AS DOUBLE) / 131072.0) END) * 1000) AS BIGINT)
                        AS noise_milli
               FROM u)
             SELECT event_type, n_users, n_clamped, sum_clamped,
                    CAST(sum_clamped * 1000 // n_users AS BIGINT)
                      AS mean_true_milli,
                    noise_milli,
                    CAST((sum_clamped * 1000 + noise_milli) // n_users
                      AS BIGINT) AS mean_released_milli
             FROM nz ORDER BY event_type"""))

  // ------------------------------------------- keyed pseudonymization --

  /** Deterministic keyed pseudonymization (GDPR art. 4(5)): user ids are
    * replaced by a 16-hex-digit surrogate derived from a peppered hash —
    * stable (the same user always maps to the same token, so joins and
    * longitudinal analyses still work on the pseudonymized table),
    * non-reversible without the pepper, and collision-audited in the same
    * pass. Emits the token mapping + per-token event counts for the
    * user_id < 15 sample, an `__total` row, and a `__collisions` row
    * (distinct users minus distinct tokens — 0 means the surrogate is
    * injective on this population).
    *
    * Scale: the token is one codegen'd md5 per row (no dictionary, no
    * shuffle — unlike sequence-numbered surrogates which need a global
    * assignment); the collision audit is two distinct-sketches in one agg.
    * 64 bits of token space holds the birthday bound past 10⁹ users; widen
    * the substring before that.
    */
  private val qPrivacyTokenize = GQuery(
    (s, d) => {
      val tok = substring(
        md5(concat(lit("pepper:"), col("user_id").cast("string"))), 1, 16)
      val ev = t(s, d, "events").select(col("user_id"), tok.as("token"))
      val sample = ev.filter(col("user_id") < 15)
        .groupBy("user_id", "token").agg(count(lit(1L)).as("n_events"))
      val summary = ev
        .agg(countDistinct("user_id").as("nu"), countDistinct("token").as("nt"))
        .select(
          array(
            struct(lit(-1L).as("user_id"), lit("__total").as("token"),
              col("nu").as("n_events")),
            struct(lit(-2L).as("user_id"), lit("__collisions").as("token"),
              (col("nu") - col("nt")).as("n_events"))).as("rows"))
        .select(explode(col("rows")).as("r"))
        .select(col("r.user_id"), col("r.token"), col("r.n_events"))
      sample.unionByName(summary).orderBy("user_id")
    },
    Some("""WITH ev AS (
              SELECT user_id,
                     substr(md5('pepper:' || CAST(user_id AS VARCHAR)), 1, 16)
                       AS token
              FROM events),
            sample AS (
              SELECT user_id, token, CAST(count(*) AS BIGINT) AS n_events
              FROM ev WHERE user_id < 15 GROUP BY 1, 2),
            summary AS (
              SELECT CAST(-1 AS BIGINT) AS user_id, '__total' AS token,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_events
              FROM ev
              UNION ALL
              SELECT CAST(-2 AS BIGINT), '__collisions',
                     CAST(count(DISTINCT user_id) - count(DISTINCT token)
                       AS BIGINT)
              FROM ev)
            SELECT user_id, token, n_events FROM sample
            UNION ALL SELECT user_id, token, n_events FROM summary
            ORDER BY user_id"""))

  // ------------------------------------------------------- t-closeness --

  /** t-closeness audit (Li et al., ICDE'07) — the third rung of the privacy
    * ladder after k-anonymity (group size) and l-diversity (distinct
    * sensitive values): how far each QI class's SENSITIVE-VALUE DISTRIBUTION
    * sits from the global one, as total-variation distance in exact ppm
    * integers. A class can be large (k-anon ✓) and diverse (l-div ✓) yet
    * still leak — e.g. 90% of its purchases in the top value band vs 10%
    * globally; TV distance is what catches that. Absent bands contribute
    * their full global mass (Σ_absent p = tp − Σ_present p — no per-band
    * outer join needed). Classes band into close (t ≤ 0.1) / drifted
    * (≤ 0.25) / leaky.
    *
    * Scale: the corpus collapses to (QI, band) cells in one partial agg;
    * every window below runs on the cell table (chisq economics). The ppm
    * quantization makes the audit hash-exact — no fp anywhere.
    */
  private val qPrivacyTclose = GQuery(
    (s, d) => {
      val cells = t(s, d, "events")
        .select(col("event_type"), hour(col("ts")).as("hod"),
          least(expr("cast(round(value * 100) as bigint) div 20000"),
            lit(9L)).as("sband"))
        .groupBy("event_type", "hod", "sband")
        .agg(count(lit(1L)).as("n_gs"))
      val wG = Window.partitionBy("event_type", "hod")
      val wS = Window.partitionBy("sband")
      val wAll = Window.partitionBy()
      val scored = cells
        .withColumn("n_g", sum("n_gs").over(wG))
        .withColumn("n_s", sum("n_gs").over(wS))
        .withColumn("nn", sum("n_gs").over(wAll))
        .withColumn("pg", expr("n_gs * 1000000 div n_g"))
        .withColumn("p", expr("n_s * 1000000 div nn"))
      // tp = Σ over bands of the global ppm (≈ 10⁶ up to div rounding):
      // derived on the distinct band table, broadcast back
      val tp = scored.select(col("sband"), col("p")).distinct()
        .agg(sum("p").as("tp"))
      scored.groupBy("event_type", "hod")
        .agg(max("n_g").as("n_rows"),
          sum(abs(col("pg") - col("p"))).as("dev_present"),
          sum("p").as("p_present"))
        .crossJoin(broadcast(tp))
        .select(col("event_type"), col("hod"), col("n_rows"),
          expr("(dev_present + (tp - p_present)) div 2").as("tv_ppm"))
        .withColumn("closeness",
          when(col("tv_ppm") <= 100000L, "close")
            .when(col("tv_ppm") <= 250000L, "drifted").otherwise("leaky"))
        .orderBy("event_type", "hod")
    },
    Some("""WITH cells AS (
              SELECT event_type, CAST(hour(ts) AS INT) AS hod,
                     least(CAST(round(value * 100) AS BIGINT)
                       // 20000, 9) AS sband,
                     CAST(count(*) AS BIGINT) AS n_gs
              FROM events GROUP BY 1, 2, 3),
            scored AS (
              SELECT event_type, hod, sband, n_gs,
                     CAST(sum(n_gs) OVER (PARTITION BY event_type, hod)
                       AS BIGINT) AS n_g,
                     CAST(sum(n_gs) OVER (PARTITION BY sband) AS BIGINT)
                       AS n_s,
                     CAST(sum(n_gs) OVER () AS BIGINT) AS nn
              FROM cells),
            ppm AS (
              SELECT event_type, hod, n_g,
                     n_gs * 1000000 // n_g AS pg,
                     n_s * 1000000 // nn AS p, sband
              FROM scored),
            tp AS (
              SELECT CAST(sum(p) AS BIGINT) AS tp
              FROM (SELECT DISTINCT sband, p FROM ppm)),
            grp AS (
              SELECT event_type, hod, max(n_g) AS n_rows,
                     sum(abs(pg - p)) AS dev_present,
                     sum(p) AS p_present
              FROM ppm GROUP BY 1, 2)
            SELECT g.event_type, g.hod, CAST(g.n_rows AS BIGINT) AS n_rows,
                   CAST((g.dev_present + (t.tp - g.p_present)) // 2
                     AS BIGINT) AS tv_ppm,
                   CASE WHEN (g.dev_present + (t.tp - g.p_present)) // 2
                          <= 100000 THEN 'close'
                        WHEN (g.dev_present + (t.tp - g.p_present)) // 2
                          <= 250000 THEN 'drifted'
                        ELSE 'leaky' END AS closeness
            FROM grp g CROSS JOIN tp t
            ORDER BY g.event_type, g.hod"""))

  // ------------------------------------------ randomized response (LDP) --

  /** Warner randomized response — the LOCAL-DP mechanism completing the
    * privacy ladder (kanon/ldiv/tclose audit at rest, q_privacy_dp releases
    * centrally; RR perturbs at the SOURCE, before any collector sees truth):
    * each event reports "was this a purchase?" truthfully with p = 3/4 and
    * flipped otherwise (ε = ln 3 — choosing ε so p is exactly rational keeps
    * the whole mechanism integer-exact), the coin being the replayable
    * md5-mod-4 draw (the q_privacy_dp / q_stats_bootstrap seeded-randomness
    * idiom — same data + same seed ⇒ same release, and both engines draw
    * identical coins). Per day: true rate (audit twin), observed noisy rate,
    * and the debiased estimate π̂ = 2p̂ − 1/2 in exact ppm — the
    * utility-vs-privacy readout an LDP deployment monitors.
    *
    * Scale: one codegen'd md5 + compare per row folding into a
    * map-side-combinable per-day conditional agg — map-only data path,
    * chisq-sized result. The estimator's error shrinks as 1/√n per cell;
    * cells too small to debias are visibly noisy in the err column, which
    * is the honest LDP tradeoff.
    */
  private val qPrivacyRr = GQuery(
    (s, d) => {
      val coin = conv(substring(md5(concat(col("event_id").cast("string"),
        lit(":rr1"))), 1, 4), 16, 10).cast("long") % 4
      val truth = (col("event_type") === "purchase").cast("long")
      val daily = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), truth.as("tr"),
          when(coin === 0L, lit(1L) - truth).otherwise(truth).as("obs"))
        .groupBy("day")
        .agg(count(lit(1L)).as("n"), sum("tr").as("true_cnt"),
          sum("obs").as("obs_cnt"))
      daily.select(col("day"), col("n"), col("true_cnt"), col("obs_cnt"),
          expr("true_cnt * 1000000 div n").as("true_ppm"),
          expr("2 * (obs_cnt * 1000000 div n) - 500000").as("est_ppm"))
        .withColumn("err_ppm", col("est_ppm") - col("true_ppm"))
        .orderBy("day")
    },
    Some(s"""WITH rows_ AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                     CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS tr,
                     ${DedupOps.duckHex4("md5(CAST(event_id AS VARCHAR) || ':rr1')")}
                       % 4 AS coin
              FROM events),
            daily AS (
              SELECT day, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(tr) AS BIGINT) AS true_cnt,
                     CAST(sum(CASE WHEN coin = 0 THEN 1 - tr ELSE tr END)
                       AS BIGINT) AS obs_cnt
              FROM rows_ GROUP BY 1)
            SELECT day, n, true_cnt, obs_cnt,
                   CAST(true_cnt * 1000000 // n AS BIGINT) AS true_ppm,
                   CAST(2 * (obs_cnt * 1000000 // n) - 500000 AS BIGINT)
                     AS est_ppm,
                   CAST(2 * (obs_cnt * 1000000 // n) - 500000
                     - true_cnt * 1000000 // n AS BIGINT) AS err_ppm
            FROM daily ORDER BY day"""))

  // ------------------------------------------------ DP top-k release --

  /** Differentially-private heavy-hitter release — the DP publication of a
    * vocabulary/query-log top-k (the mechanism behind every "most searched
    * terms" release): per-token counts get the q_privacy_dp deterministic
    * Laplace noise (ε = 0.5, md5-seeded inverse-CDF — replayable release),
    * then only tokens whose NOISY count clears a release threshold
    * τ = 50 000 milli-counts are published (the thresholding is what
    * protects the tail: rare tokens — potentially identifying — never
    * appear, with or without noise luck, because τ sits many noise scales
    * above 1). Unit-count sensitivity is the documents-contribute-once
    * model: counts are per-DOC token presence (distinct per doc), bounding
    * each document's influence at 1 per token.
    *
    * Scale: one distinct-(doc, token) collapse + a token agg + map-only
    * noise/threshold — released rows ≪ vocab; the audit column (true
    * count) rides the same agg and exists because a DP release pipeline
    * always keeps a private-side audit twin.
    */
  private val qPrivacyDpTopk = GQuery(
    (s, d) => {
      val counts = t(s, d, "documents")
        .select(col("doc_id"), explode(array_distinct(
          split(lower(col("text")), " "))).as("tok"))
        .groupBy("tok").agg(count(lit(1L)).as("n_true"))
      val u16 = conv(substring(md5(concat(col("tok"), lit(":dptk1"))),
        1, 4), 16, 10).cast("long")
      val dev = abs(u16 * 2 + 1 - 65536L)
      val mag = lit(-2.0) * log((lit(131072L) - dev * 2).cast("double") / 131072.0)
      val noise = when(u16 * 2 + 1 >= 65536L, mag).otherwise(-mag)
      counts
        .withColumn("noise_milli", round(noise * 1000).cast("long"))
        .withColumn("released_milli",
          col("n_true") * 1000 + col("noise_milli"))
        .filter(col("released_milli") >= 50000L)
        .select(col("tok"), col("released_milli"), col("noise_milli"),
          col("n_true"))
        .orderBy("tok")
    },
    Some(s"""WITH c AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS n_true FROM (
                SELECT doc_id, unnest(list_distinct(
                  string_split(lower(text), ' '))) AS tok
                FROM documents)
              GROUP BY 1),
            u AS (
              SELECT tok, n_true,
                     ${DedupOps.duckHex4("md5(tok || ':dptk1')")} AS u16
              FROM c),
            nz AS (
              SELECT tok, n_true,
                     CAST(round((CASE WHEN u16 * 2 + 1 >= 65536
                         THEN -2.0 * ln(CAST(131072 - abs(u16 * 2 + 1 - 65536)
                           * 2 AS DOUBLE) / 131072.0)
                         ELSE 2.0 * ln(CAST(131072 - abs(u16 * 2 + 1 - 65536)
                           * 2 AS DOUBLE) / 131072.0) END) * 1000) AS BIGINT)
                       AS noise_milli
              FROM u)
            SELECT tok, n_true * 1000 + noise_milli AS released_milli,
                   noise_milli, n_true
            FROM nz
            WHERE n_true * 1000 + noise_milli >= 50000
            ORDER BY tok"""))

  // ------------------------------------------ DP quantile release --

  /** ε-DP median release via the EXPONENTIAL MECHANISM (McSherry & Talwar
    * 2007) — the third DP primitive beside additive Laplace
    * (q_privacy_dp/_mean) and local randomized response (q_privacy_rr):
    * quantiles have unbounded sensitivity for additive noise, so the
    * mechanism instead SCORES every candidate value v by utility
    * u(v) = −|rank(v) − n/2| and samples ∝ exp(ε·u/2). Sampling runs as
    * the Gumbel-max trick — argmax(ε·u/2 + Gumbel) ≡ the exponential
    * draw — with the Gumbel g = −ln(−ln(u01)) seeded from
    * md5(type:value) (the q_privacy_dp replayable-release discipline)
    * and quantized to milli (round-milli ln: 1-ulp libm drift ≪ the
    * rounding step — the elasticity sanction). Utilities stay integral
    * on the doubled grid (u2 = −|2·cle − n|, score = ε_milli·u2 div 4);
    * per event type the released DP median rides beside the exact
    * median and the dollar error — the privacy/utility readout.
    *
    * Scale: per-user rollup (map-combinable) → per-type value GRID;
    * rank = grid cumsum (wquantile economics), score/argmax are
    * grid-sized windows partitioned by type. The mechanism never sees
    * row-level data after the rollup.
    */
  private val qPrivacyDpQuantile = GQuery(
    (s, d) => {
      val cents = graft.Exact.cents(col("value"))
      val us = Tables(s, d, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(cents).as("c"))
        .select(col("event_type"), expr("c div 100").as("v"))
      val grid = us.groupBy("event_type", "v").agg(count(lit(1L)).as("cnt"))
      val wCum = Window.partitionBy("event_type").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wN = Window.partitionBy("event_type")
      val scored = grid
        .withColumn("cle", sum("cnt").over(wCum))
        .withColumn("n", sum("cnt").over(wN))
        .withColumn("u2", -abs(col("cle") * 2 - col("n")))
        .withColumn("s_milli", expr("(1000 * u2) div 4"))
        .withColumn("g_milli", expr(
          """CAST(round(-ln(-ln((CAST(conv(substring(md5(concat(
               event_type, ':', CAST(v AS STRING), ':dpq1')), 1, 4),
               16, 10) AS DOUBLE) + 0.5) / 65536.0)) * 1000)
             AS BIGINT)"""))
        .withColumn("t_milli", col("s_milli") + col("g_milli"))
        .localCheckpoint(true) // feeds the DP argmax AND the exact median
      val wPick = Window.partitionBy("event_type")
        .orderBy(col("t_milli").desc, col("v").asc)
      val dp = scored.withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("n").as("n_users"),
          col("v").as("dp_med_d"), col("t_milli").as("win_score_milli"))
      val wMed = Window.partitionBy("event_type")
        .orderBy(col("v").asc)
      val exact = scored.filter(col("cle") * 2 >= col("n"))
        .withColumn("rk", row_number().over(wMed))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("v").as("true_med_d"))
      dp.join(exact, "event_type")
        .select(col("event_type"), col("n_users"), col("true_med_d"),
          col("dp_med_d"),
          (col("dp_med_d") - col("true_med_d")).as("err_d"),
          lit(1000L).as("eps_milli"))
        .orderBy("event_type")
    },
    Some(s"""WITH us AS (
              SELECT event_type,
                     CAST(sum(CAST(round(value * 100) AS BIGINT)) // 100 AS BIGINT) AS v
              FROM events GROUP BY event_type, user_id),
            grid AS (
              SELECT event_type, v, CAST(count(*) AS BIGINT) AS cnt
              FROM us GROUP BY 1, 2),
            cum AS (
              SELECT event_type, v, cnt,
                     CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cle,
                     CAST(sum(cnt) OVER (PARTITION BY event_type)
                       AS BIGINT) AS n
              FROM grid),
            scored AS (
              SELECT event_type, v, cle, n,
                     (1000 * (-abs(cle * 2 - n))) // 4 AS s_milli,
                     CAST(round(-ln(-ln((CAST(
                       ${DedupOps.duckHex4(
                         "md5(event_type || ':' || CAST(v AS VARCHAR) || ':dpq1')")}
                       AS DOUBLE) + 0.5) / 65536.0)) * 1000) AS BIGINT)
                       AS g_milli
              FROM cum),
            dp AS (
              SELECT event_type, n AS n_users, v AS dp_med_d,
                     s_milli + g_milli AS win_score_milli
              FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                      ORDER BY s_milli + g_milli DESC, v ASC) AS rk
                    FROM scored)
              WHERE rk = 1),
            exact AS (
              SELECT event_type, v AS true_med_d
              FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                      ORDER BY v ASC) AS rk
                    FROM scored WHERE cle * 2 >= n)
              WHERE rk = 1)
            SELECT d.event_type, d.n_users, e.true_med_d, d.dp_med_d,
                   CAST(d.dp_med_d - e.true_med_d AS BIGINT) AS err_d,
                   CAST(1000 AS BIGINT) AS eps_milli
            FROM dp d JOIN exact e USING (event_type)
            ORDER BY d.event_type"""))

  // --------------------------------------------- cell suppression --

  /** Statistical-disclosure cell suppression (census/Eurostat practice —
    * public): the (type, day) count table is released only where cells
    * clear a threshold, and — the part naive implementations skip —
    * PRIMARY suppression alone is reversible: a row with exactly one
    * hidden cell re-derives from its margin, so a COMPLEMENTARY partner
    * (the smallest surviving cell in that row, then the same sweep down
    * columns) must hide too. The threshold is the 20th-percentile cell
    * count from the grid order statistic (5·cum ≥ n_cells — scale-
    * invariant where a fixed k would stop suppressing at 10× the data);
    * one row sweep + one column sweep of the greedy, statuses
    * ok/primary/comp_row/comp_col, released n nulled when hidden. All
    * counts exact; ties break on calendar/type order so the partner
    * choice hashes.
    *
    * Scale: the corpus collapses to the types×days grid before anything;
    * sweeps are grid-partitioned windows (row partitions = |days| cells).
    * Full cascading suppression iterates the same two sweeps to a fixed
    * point — bounded by grid diameter, never corpus size.
    */
  private val qPrivacySuppression = GQuery(
    (s, d) => {
      val cells = t(s, d, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy("event_type", "day").agg(count(lit(1L)).as("n"))
        .localCheckpoint(true) // threshold grid + both sweeps
      val wCum = Window.orderBy("n")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thr = cells.groupBy("n").agg(count(lit(1L)).as("cnt"))
        .withColumn("cum", sum("cnt").over(wCum))
        .crossJoin(broadcast(cells.agg(count(lit(1L)).as("nc"))))
        .agg(min(when(lit(5) * col("cum") >= col("nc"), col("n"))).as("t"))
      val p1 = cells.crossJoin(broadcast(thr))
        .withColumn("primary", col("n") < col("t"))
      // rank partitions include the suppression flag so hidden cells
      // never occupy a pick rank (the partner must be a SURVIVING cell)
      val wRowPick = Window.partitionBy("event_type", "primary")
        .orderBy(col("n"), col("day"))
      val rowCnt = p1.groupBy("event_type")
        .agg(sum(col("primary").cast("long")).as("np_row"))
      val p2 = p1.join(broadcast(rowCnt), "event_type")
        .withColumn("rrk", row_number().over(wRowPick))
        .withColumn("comp_row",
          !col("primary") && col("np_row") === 1L && col("rrk") === 1)
      val p2c = p2.withColumn("supp1", col("primary") || col("comp_row"))
      val wColPick = Window.partitionBy("day", "supp1")
        .orderBy(col("n"), col("event_type"))
      val colCnt = p2c.groupBy("day")
        .agg(sum(col("supp1").cast("long")).as("np_col"))
      val p3 = p2c.join(broadcast(colCnt), "day")
        .withColumn("crk", row_number().over(wColPick))
        .withColumn("comp_col",
          !col("supp1") && col("np_col") === 1L && col("crk") === 1)
      p3.select(col("event_type"), col("day"),
          when(col("primary"), "primary")
            .when(col("comp_row"), "comp_row")
            .when(col("comp_col"), "comp_col")
            .otherwise("ok").as("status"),
          when(col("primary") || col("comp_row") || col("comp_col"),
            lit(null).cast("long")).otherwise(col("n")).as("n_released"))
        .orderBy("event_type", "day")
    },
    Some("""WITH cells AS (
              SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2),
            grid AS (
              SELECT n, CAST(count(*) AS BIGINT) AS cnt
              FROM cells GROUP BY 1),
            cum AS (
              SELECT n, CAST(sum(cnt) OVER (ORDER BY n
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum
              FROM grid),
            nc AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM cells),
            thr AS (
              SELECT min(CASE WHEN 5 * cum >= nc THEN n END) AS t
              FROM cum, nc),
            p1 AS (
              SELECT c.event_type, c.day, c.n, c.n < t.t AS prim
              FROM cells c, thr t),
            rowcnt AS (
              SELECT event_type,
                     CAST(sum(CASE WHEN prim THEN 1 ELSE 0 END) AS BIGINT)
                       AS np_row
              FROM p1 GROUP BY 1),
            p2 AS (
              SELECT p1.*, r.np_row,
                     row_number() OVER (
                       PARTITION BY p1.event_type, prim
                       ORDER BY p1.n, p1.day) AS rrk
              FROM p1 JOIN rowcnt r USING (event_type)),
            p2b AS (
              SELECT *, NOT prim AND np_row = 1 AND rrk = 1 AS comp_row
              FROM p2),
            colcnt AS (
              SELECT day,
                     CAST(sum(CASE WHEN prim OR comp_row THEN 1 ELSE 0 END)
                       AS BIGINT) AS np_col
              FROM p2b GROUP BY 1),
            p3 AS (
              SELECT p2b.*, c.np_col,
                     row_number() OVER (
                       PARTITION BY p2b.day, prim OR comp_row
                       ORDER BY p2b.n, p2b.event_type) AS crk
              FROM p2b JOIN colcnt c USING (day)),
            p3b AS (
              SELECT *, NOT (prim OR comp_row) AND np_col = 1 AND crk = 1
                       AS comp_col
              FROM p3)
            SELECT event_type, day,
                   CASE WHEN prim THEN 'primary'
                        WHEN comp_row THEN 'comp_row'
                        WHEN comp_col THEN 'comp_col'
                        ELSE 'ok' END AS status,
                   CASE WHEN prim OR comp_row OR comp_col
                     THEN NULL ELSE n END AS n_released
            FROM p3b ORDER BY event_type, day"""))

  // ------------------------------------------- re-identification risk --

  /** Re-identification risk metrics (the ARX prosecutor model) over
    * q_privacy_kanon's quasi-identifier classes — kanon REMEDIATES by
    * generalizing; this MEASURES the raw table so the release decision has
    * a number: per k-threshold t ∈ {2, 5, 11, 14}, how many equivalence
    * classes and records sit below t, plus the global prosecutor risks —
    * avg_risk_ppm = |classes|·10⁶ div n (the mean of 1/k over records,
    * exactly Σ_classes 1 over n) and max_risk_ppm = 10⁶ div min k. All
    * exact integers; thresholds include kanon's K = 14 so the two
    * queries' verdicts compose (records_lt at t = 14 is exactly the mass
    * kanon's level-0 pass suppresses into coarser levels).
    *
    * Scale: one QI-class agg (map-combinable) → |classes| rows crossed
    * with a 4-row broadcast threshold grid + a 1-row broadcast global —
    * nothing record-sized past the first agg.
    */
  private val qPrivacyReidRisk = GQuery(
    (s, d) => {
      val classes = Tables(s, d, "customer")
        .groupBy(col("c_nationkey").cast("string").as("nat"),
          col("c_mktsegment").as("seg"))
        .agg(count(lit(1L)).as("k"))
        .localCheckpoint(true) // feeds the threshold grid AND the global row
      val glob = classes.agg(count(lit(1L)).as("n_classes"),
        sum("k").as("n"), min("k").as("min_k"))
      val ts = s.range(1).select(
        explode(array(lit(2L), lit(5L), lit(11L), lit(14L))).as("t"))
      classes.crossJoin(broadcast(ts))
        .groupBy("t")
        .agg(sum(when(col("k") < col("t"), 1L).otherwise(0L))
            .as("classes_lt"),
          sum(when(col("k") < col("t"), col("k")).otherwise(0L))
            .as("records_lt"))
        .crossJoin(broadcast(glob))
        .select(col("t").as("threshold"), col("n_classes"), col("n"),
          col("classes_lt"), col("records_lt"),
          expr("records_lt * 1000000 div n").as("records_lt_ppm"),
          expr("n_classes * 1000000 div n").as("avg_risk_ppm"),
          expr("1000000 div min_k").as("max_risk_ppm"))
        .orderBy("threshold")
    },
    Some("""WITH classes AS (
              SELECT CAST(c_nationkey AS VARCHAR) AS nat,
                     c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS k
              FROM customer GROUP BY 1, 2),
            tot AS (
              SELECT CAST(count(*) AS BIGINT) AS n_classes,
                     CAST(sum(k) AS BIGINT) AS n,
                     CAST(min(k) AS BIGINT) AS min_k
              FROM classes),
            ts AS (SELECT unnest([2, 5, 11, 14]) AS t),
            per AS (
              SELECT t,
                     CAST(sum(CASE WHEN k < t THEN 1 ELSE 0 END) AS BIGINT)
                       AS classes_lt,
                     CAST(sum(CASE WHEN k < t THEN k ELSE 0 END) AS BIGINT)
                       AS records_lt
              FROM classes CROSS JOIN ts GROUP BY 1)
            SELECT CAST(t AS BIGINT) AS threshold, n_classes, n,
                   classes_lt, records_lt,
                   CAST(records_lt * 1000000 // n AS BIGINT)
                     AS records_lt_ppm,
                   CAST(n_classes * 1000000 // n AS BIGINT) AS avg_risk_ppm,
                   CAST(1000000 // min_k AS BIGINT) AS max_risk_ppm
            FROM per CROSS JOIN tot ORDER BY threshold"""))

  val queries: Map[String, GQuery] = Map(
    "q_privacy_reid_risk" -> qPrivacyReidRisk,
    "q_privacy_suppression" -> qPrivacySuppression,
    "q_privacy_dp_quantile" -> qPrivacyDpQuantile,
    "q_stats_brier" -> qStatsBrier,
    "q_privacy_dp_topk" -> qPrivacyDpTopk,
    "q_privacy_rr" -> qPrivacyRr,
    "q_privacy_tclose" -> qPrivacyTclose,
    "q_privacy_tokenize" -> qPrivacyTokenize,
    "q_privacy_dp" -> qPrivacyDp,
    "q_privacy_dp_consistent" -> qPrivacyDpConsistent,
    "q_privacy_dp_mean" -> qPrivacyDpMean,
    "q_quality_expectations" -> qQualityExpectations,
    "q_privacy_ldiv" -> qPrivacyLdiv,
    "q_stats_calibration" -> qStatsCalibration,
    "q_events_gaps" -> qEventsGaps,
    "q_stats_benford" -> qStatsBenford)
}
