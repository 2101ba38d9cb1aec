package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.streaming.EventStreams

/** Event-sequence analytics over `events` — the ordered-behavior
  * queries (funnel, cohort retention, exponential decay) that complete
  * the time-series family next to ev1–ev4's sessionize / resample /
  * time-weighted forms. The reference designs ordered partition
  * analysis (`Kernel/README.md:188-205` — rank within partition, then
  * aggregate); these are that pattern instantiated on event ORDER
  * rather than rank: each query's heart is "per user, in time order,
  * what happened next".
  *
  * Determinism contract (the repo-wide gate convention): every
  * time comparison runs on exact BIGINT nanos from
  * [[EventStreams.tsNanos]], every value enters fixed-point micro
  * BIGINTs before any cross-row combination, and every ordered fold
  * totals its order with `event_id` so no two rows tie.
  *
  * Scale: all three queries shuffle once on `user_id` (the funnel's
  * per-step joins are user-keyed and collapse under AQE to the same
  * exchange); per-user state is one user's history, never corpus-
  * bounded. A viral user (millions of events) bounds ev7's collected
  * history — the streaming sessionize path (st7) is the unbounded-user
  * form of this family.
  */
object EventAnalytics extends QueryPack {

  /** Exact-nano event view shared by the pack. */
  private def ev(s: SparkSession, d: String): DataFrame =
    EventStreams.tsNanos(EventStreams.normalizeTs(t(s, d, "events")))

  /** ev5 — ordered funnel (view → click → purchase): step N counts
    * users whose earliest step-N event follows THEIR step-(N-1) time,
    * with the whole funnel closing within 7 days of the first view.
    * Min-ts chaining makes each step's anchor unique per user, so the
    * counts are deterministic. Per-step plans are user-keyed
    * aggregates + joins — one shuffle key throughout, no window over
    * the full corpus. */
  private def ev5(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).select(col("user_id"), col("event_type"), col("tns"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("tns").as("v_tns"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("tns") > col("v_tns"))
      .groupBy(col("user_id"), col("v_tns")).agg(min("tns").as("c_tns"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("tns") > col("c_tns") &&
        col("tns") <= col("v_tns") + lit(604800000000000L))
      .groupBy("user_id").agg(min("tns").as("p_tns"))
    def stepRow(df: DataFrame, n: Long, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(n).as("step"), lit(name).as("step_name"), col("n_users"))
    stepRow(v, 1L, "view")
      .unionByName(stepRow(c, 2L, "click"))
      .unionByName(stepRow(p, 3L, "purchase"))
  }

  /** ev6 — weekly cohort retention: cohort = the ISO week of a user's
    * first event, cell (cohort, k) = distinct users of that cohort
    * active in cohort-week + k. Both week stamps are Monday-truncated,
    * so the offset is an exact integer division of whole days.
    * Distinct-per-(user, week) FIRST bounds everything downstream by
    * #users × #weeks, not event count — the property that keeps a
    * retention matrix over a 100 TB event corpus small after one
    * exchange. */
  private def ev6(s: SparkSession, d: String): DataFrame = {
    val wk = EventStreams.normalizeTs(t(s, d, "events"))
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    wk.join(cohort, "user_id")
      .groupBy(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort"),
        expr("CAST(datediff(wk, cohort_wk) DIV 7 AS BIGINT)").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** ev7 — integer EWMA (α = 1/2) of each user's value stream: fold
    * acc' = acc >> 1 + vmicro over the user's time-ordered events.
    * Shift-right of a non-negative micro fixed-point accumulator is
    * exact floor division, and the fold visits rows in the
    * `(tns, event_id)` total order via an array sort — identical
    * step-by-step to the oracle's `list_reduce` (whose first-element
    * seeding equals the zero seed here because `0 >> 1 + x = x`).
    * One user-keyed exchange; history is collected per user (see the
    * pack doc's viral-user note). */
  private def ev7(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .select(col("user_id"), col("tns"), col("event_id"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("vmicro"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        expr("""aggregate(
            transform(array_sort(collect_list(struct(tns, event_id, vmicro))),
              r -> r.vmicro),
            CAST(0 AS BIGINT), (acc, x) -> shiftright(acc, 1) + x)""")
          .as("ewma_micro"))

  /** ev8 — first-order Markov transition matrix over event types (the
    * next-event behavior model behind "users who viewed then
    * clicked…"): per user, each event pairs with its successor in the
    * `(tns, event_id)` total order (one user-keyed window — the
    * family's single shuffle key), transitions count into a
    * #types²-bounded matrix, and each row's probability is an exact
    * integer-division micro (`n·10⁶ div Σrow` — no float division, so
    * both engines truncate identically). The per-from normalization
    * windows over the TINY matrix, never the corpus. */
  private def ev8(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tns"), col("event_id"))
    ev(s, d)
      .select(col("user_id"), col("tns"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p_micro", expr(
        """CAST((n_trans * 1000000L) DIV (sum(n_trans) OVER
           (PARTITION BY from_type)) AS BIGINT)"""))
  }

  /** ev9 — rolling z-score anomaly detection (the monitoring-pipeline
    * outlier filter): a value is anomalous when it sits more than 3
    * standard deviations from the mean of the SAME user's previous ≤20
    * values. The whole test runs in BIGINT: with S = Σprev, Q = Σprev²
    * over n trailing values (milli fixed-point), z² > 9 is EXACTLY
    * `(n·x − S)² > 9·(n·Q − S²)` — the float mean/stddev/sqrt chain is
    * algebraically cleared out, so no cross-engine ulp can flip a flag
    * (and a var-0 window flags any deviation, the correct limit).
    * Magnitudes are audited: value ≤ 491 → milli ≤ 4.92e5, n ≤ 20 ⇒
    * n·Q ≤ 9.7e13, ×9 well inside BIGINT even at 10⁶× the fixture.
    * One user-keyed window over `(tns, event_id)` — the family's
    * single shuffle key; state is ROWS-framed (20 rows), constant per
    * user regardless of corpus size. */
  private def ev9(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tns"), col("event_id"))
      .rowsBetween(-20, -1)
    ev(s, d)
      .select(col("user_id"), col("event_id"),
        col("tns"), expr("CAST(floor(value * 1000) AS BIGINT)").as("vmilli"))
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("s1", sum("vmilli").over(w))
      .withColumn("s2", sum(col("vmilli") * col("vmilli")).over(w))
      .filter(col("n_prev") >= 8)
      .withColumn("num", col("n_prev") * col("vmilli") - col("s1"))
      .withColumn("den", col("n_prev") * col("s2") - col("s1") * col("s1"))
      .filter(col("num") * col("num") > lit(9L) * col("den"))
      .select(col("user_id"), col("event_id"), col("vmilli"),
        col("n_prev"), col("num"), col("den"))
  }

  /** ev10 — row-pattern detection by gaps-and-islands (the batch form
    * of MATCH_RECOGNIZE / CEP "drawdown" queries — Trino/Flink ship the
    * former, this is the same semantics in three window passes):
    * maximal runs of STRICTLY DECREASING value per user, kept when the
    * run spans ≥ 4 events, emitting run length and endpoint values.
    * Islands are the classic construction — `lag` marks decreases, a
    * running sum of run-breaks numbers the islands, and per-island
    * row_number picks the endpoints. All three windows key on user_id
    * (the island window's (user, island) clustering is satisfied by
    * the user_id hash partitioning — subset clustering), so the whole
    * detection is ONE exchange, plan-audited. Values compare in milli
    * fixed-point BIGINT — run boundaries can't flip on a ulp. */
  private def ev10(s: SparkSession, d: String): DataFrame = {
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tns"), col("event_id"))
    val wi = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "island").orderBy(col("tns"), col("event_id"))
    val marked = ev(s, d)
      .select(col("user_id"), col("event_id"), col("tns"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("vmilli"))
      .withColumn("brk",
        when(col("vmilli") < lag("vmilli", 1).over(wu), lit(0L)).otherwise(lit(1L)))
      .withColumn("island", sum("brk").over(wu))
    marked
      .withColumn("rn", row_number().over(wi))
      .withColumn("n_run", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id", "island")))
      .filter(col("n_run") >= 4)
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_event"),
        max(when(col("rn") === 1, col("vmilli"))).as("start_vmilli"),
        max(when(col("rn") === col("n_run"), col("vmilli"))).as("end_vmilli"))
      .select(col("user_id"), col("n_events"), col("min_event"),
        col("start_vmilli"), col("end_vmilli"))
  }

  /** ev11 — LAST-TOUCH ATTRIBUTION (the marketing-analytics staple):
    * each purchase attributes to the SAME user's latest preceding view
    * or click within 7 days, else 'unattributed'; conversions and
    * revenue roll up per channel. The lookup IS the house as-of join
    * ([[graft.operators.AsOfJoin.asOfMatch]], j9's proven union+running-
    * frame machinery — one user-keyed exchange, O(n) per key, never a
    * per-purchase subquery); same-instant touch ties resolve by
    * max(event_type), pinned identically in the oracle. Exact BIGINT
    * nano gaps and micro revenue — no float anywhere. */
  private def ev11(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), col("tns"),
      expr("CAST(floor(value * 1000000) AS BIGINT)").as("vmicro"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "tns", "vmicro")
    val touches = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("tns"), col("event_type").as("touch"))
    graft.operators.AsOfJoin.asOfMatch(purchases, touches,
        "user_id", "tns", "touch",
        tolerance = Some(lit(7L * 24 * 3600 * 1000000000L)))
      .groupBy(coalesce(col("asof_touch"), lit("unattributed")).as("channel"))
      .agg(count(lit(1)).as("n_conv"), sum("vmicro").as("sum_vmicro"))
  }

  /** ev12 — time-to-conversion survival curve: per signup, the delay
    * to that user's FIRST purchase within a 14-day horizon; the curve
    * row for day d (0..13) reports how many signups had converted by
    * the end of day d and how many were still unconverted — the
    * activation / Kaplan-Meier-style readout every growth pipeline
    * reports. Scale: corpus-sized work happens exactly once — a
    * user-keyed time-bounded join + a min-per-signup aggregate (state
    * ∝ signups, never events); the cumulative window then runs over
    * the 14-row day frame. Delays are exact nano BIGINTs, day = floor
    * division. */
  private def ev12(s: SparkSession, d: String): DataFrame = {
    val horizonNs = 14L * 86400L * 1000000000L
    val e = ev(s, d)
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("tns").as("s_tns"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tns").as("p_tns"))
    val firstConv = signups.join(purchases, Seq("user_id"))
      .filter(col("p_tns") >= col("s_tns") &&
        col("p_tns") < col("s_tns") + lit(horizonNs))
      .groupBy("signup_id")
      .agg(min(col("p_tns") - col("s_tns")).as("delay_ns"))
    val byDay = firstConv
      .select(expr("CAST(delay_ns DIV 86400000000000 AS BIGINT)").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_day"))
    val days = s.range(0, 14).select(col("id").as("day"))
    val win = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    days.join(byDay, Seq("day"), "left")
      .crossJoin(broadcast(signups.agg(count(lit(1)).as("n_signups"))))
      .select(col("day"),
        sum(coalesce(col("n_day"), lit(0L))).over(win).as("n_converted"),
        (col("n_signups") -
          sum(coalesce(col("n_day"), lit(0L))).over(win)).as("n_unconverted"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev10_pattern_islands" -> (ev10 _),
    "ev11_attribution" -> (ev11 _),
    "ev12_time_to_conversion" -> (ev12 _),
    "ev5_funnel" -> (ev5 _),
    "ev6_retention" -> (ev6 _),
    "ev7_ewma_decay" -> (ev7 _),
    "ev8_transition_matrix" -> (ev8 _),
    "ev9_anomaly_zscore" -> (ev9 _),
  )

  override val oracles: Map[String, String] = Map(
    "ev12_time_to_conversion" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
                  epoch_ns(CAST(ts AS TIMESTAMP)) AS tns
           FROM events),
         s AS (SELECT event_id AS signup_id, user_id, tns AS s_tns
               FROM e WHERE event_type = 'signup'),
         p AS (SELECT user_id, tns AS p_tns
               FROM e WHERE event_type = 'purchase'),
         f AS (SELECT signup_id, min(p_tns - s_tns) AS delay_ns
               FROM s JOIN p USING (user_id)
               WHERE p_tns >= s_tns AND p_tns < s_tns + 1209600000000000
               GROUP BY signup_id),
         bd AS (SELECT CAST(delay_ns // 86400000000000 AS BIGINT) AS day,
                       count(*) AS n_day
                FROM f GROUP BY 1),
         days AS (SELECT CAST(x AS BIGINT) AS day FROM range(0, 14) t(x)),
         tot AS (SELECT count(*) AS n_signups FROM s)
         SELECT day,
           CAST(sum(coalesce(n_day, 0)) OVER w AS BIGINT) AS n_converted,
           CAST(n_signups - sum(coalesce(n_day, 0)) OVER w AS BIGINT)
             AS n_unconverted
         FROM days LEFT JOIN bd USING (day), tot
         WINDOW w AS (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    // the correlated scalar lookup states the as-of semantics directly;
    // same-ts touch ties pre-collapse to max(event_type) exactly as the
    // operator's right-side dedup does
    "ev11_attribution" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
                  epoch_ns(CAST(ts AS TIMESTAMP)) AS tns,
                  CAST(floor(value * 1000000) AS BIGINT) AS vmicro
           FROM events),
         p AS (SELECT * FROM e WHERE event_type = 'purchase'),
         tch AS (
           SELECT user_id, tns, max(event_type) AS touch
           FROM e WHERE event_type IN ('view', 'click') GROUP BY 1, 2),
         m AS (
           SELECT p.user_id, p.event_id, p.vmicro,
                  (SELECT t.touch FROM tch t
                   WHERE t.user_id = p.user_id AND t.tns <= p.tns
                     AND p.tns - t.tns <= 604800000000000
                   ORDER BY t.tns DESC LIMIT 1) AS touch
           FROM p)
         SELECT coalesce(touch, 'unattributed') AS channel,
                count(*) AS n_conv,
                CAST(sum(vmicro) AS BIGINT) AS sum_vmicro
         FROM m GROUP BY 1""",
    "ev10_pattern_islands" ->
      """WITH e AS (
           SELECT user_id, event_id,
                  epoch_ns(CAST(ts AS TIMESTAMP)) AS tns,
                  CAST(floor(value * 1000) AS BIGINT) AS vmilli
           FROM events),
         m AS (
           SELECT *, CASE WHEN vmilli < lag(vmilli) OVER
                    (PARTITION BY user_id ORDER BY tns, event_id)
                  THEN 0 ELSE 1 END AS brk
           FROM e),
         i AS (
           SELECT *, sum(brk) OVER
                    (PARTITION BY user_id ORDER BY tns, event_id) AS island
           FROM m),
         r AS (
           SELECT *, row_number() OVER
                    (PARTITION BY user_id, island
                     ORDER BY tns, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id, island) AS n_run
           FROM i)
         SELECT user_id, count(*) AS n_events, min(event_id) AS min_event,
                max(CASE WHEN rn = 1 THEN vmilli END) AS start_vmilli,
                max(CASE WHEN rn = n_run THEN vmilli END) AS end_vmilli
         FROM r WHERE n_run >= 4
         GROUP BY user_id, island""",
    "ev9_anomaly_zscore" ->
      """WITH e AS (
           SELECT user_id, event_id,
                  epoch_ns(CAST(ts AS TIMESTAMP)) AS tns,
                  CAST(floor(value * 1000) AS BIGINT) AS vmilli
           FROM events),
         w AS (
           SELECT user_id, event_id, vmilli,
                  count(*) OVER win AS n_prev,
                  CAST(sum(vmilli) OVER win AS BIGINT) AS s1,
                  CAST(sum(vmilli * vmilli) OVER win AS BIGINT) AS s2
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY tns, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
         SELECT user_id, event_id, vmilli, n_prev,
                CAST(n_prev * vmilli - s1 AS BIGINT) AS num,
                CAST(n_prev * s2 - s1 * s1 AS BIGINT) AS den
         FROM w
         WHERE n_prev >= 8
           AND (n_prev * vmilli - s1) * (n_prev * vmilli - s1)
               > 9 * (n_prev * s2 - s1 * s1)""",
    "ev8_transition_matrix" ->
      """WITH e AS (
           SELECT user_id, event_type, event_id,
                  epoch_ns(CAST(ts AS TIMESTAMP)) AS tns
           FROM events),
         tr AS (SELECT event_type AS from_type,
                       lead(event_type) OVER (PARTITION BY user_id
                         ORDER BY tns, event_id) AS to_type
                FROM e),
         c AS (SELECT from_type, to_type, count(*) AS n_trans
               FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n_trans,
                CAST(n_trans * 1000000 //
                  sum(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
                  AS p_micro
         FROM c""",
    "ev5_funnel" ->
      """WITH e AS (
           SELECT user_id, event_type,
                  epoch_ns(CAST(ts AS TIMESTAMP)) AS tns
           FROM events),
         v AS (SELECT user_id, min(tns) AS v_tns FROM e
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, v.v_tns, min(e.tns) AS c_tns
               FROM e JOIN v ON e.user_id = v.user_id
               WHERE e.event_type = 'click' AND e.tns > v.v_tns
               GROUP BY e.user_id, v.v_tns),
         p AS (SELECT e.user_id, min(e.tns) AS p_tns
               FROM e JOIN c ON e.user_id = c.user_id
               WHERE e.event_type = 'purchase' AND e.tns > c.c_tns
                 AND e.tns <= c.v_tns + 604800000000000
               GROUP BY e.user_id)
         SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
                count(*) AS n_users FROM v
         UNION ALL SELECT CAST(2 AS BIGINT), 'click', count(*) FROM c
         UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM p""",
    "ev6_retention" ->
      """WITH wk AS (
           SELECT DISTINCT user_id,
                  date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
           FROM events),
         cohort AS (SELECT user_id, min(wk) AS cohort_wk
                    FROM wk GROUP BY user_id)
         SELECT strftime(c.cohort_wk, '%Y-%m-%d') AS cohort,
                CAST(datediff('day', c.cohort_wk, w.wk) // 7 AS BIGINT)
                  AS week_offset,
                count(*) AS n_users
         FROM wk w JOIN cohort c ON w.user_id = c.user_id
         GROUP BY 1, 2""",
    "ev7_ewma_decay" ->
      """SELECT user_id, count(*) AS n_events,
                list_reduce(
                  list(CAST(floor(value * 1000000) AS BIGINT)
                       ORDER BY epoch_ns(CAST(ts AS TIMESTAMP)), event_id),
                  (acc, x) -> acc // 2 + x) AS ewma_micro
         FROM events GROUP BY user_id""",
  )
}
