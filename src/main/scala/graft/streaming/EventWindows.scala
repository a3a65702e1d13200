package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-window aggregation over the events table. The reference has no true
  * streaming (its only incremental work is a poll-based status queue,
  * ingest/profiling/profiler.py:9-41 — see SURVEY.md §2.10), so these
  * operators exist in both batch form (oracle-checkable) and Structured
  * Streaming form (same logical plan over readStream; demonstrated in tests
  * with a memory sink).
  *
  * Window starts are emitted as epoch seconds so the DuckDB oracle
  * (`time_bucket`) compares exactly; sums rounded to 4 decimals to absorb
  * accumulation-order float noise.
  */
object EventWindows {

  /** Tumbling-window aggregate: (window_start, event_type, n, total, mean). */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 4).as("total"),
        // mean derived from the ROUNDED total: means of 2-decimal values
        // over small counts land exactly on rounding-grid boundaries
        // (58.47375 at n=24 — observed at sf0.1), where accumulation-order
        // noise flips the direction. The rounded total is boundary-safe
        // (2-decimal-exact sums sit far from any 1e-4 half-step), and both
        // engines then divide identical doubles.
        round(round(sum("value"), 4) / count(lit(1)), 6).as("mean"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("total"), col("mean"))

  /** Sliding-window aggregate (no oracle — DuckDB lacks a direct equivalent;
    * covered by unit tests against a manual expansion).
    */
  def sliding(events: DataFrame, width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .select(unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Session windows per user with an inactivity gap; oracle = classic
    * gaps-and-islands SQL (lag + running sum of session starts).
    */
  def sessions(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start"),
        col("n"), col("total"))

  /** Ordered-sequence funnel: how many users complete step 1, then step 2
    * STRICTLY AFTER their step-1 time, then step 3 after that, ... — the
    * classic conversion analysis over an event stream. Each stage is the
    * minimal completion time given the previous stage's time, so the fold is
    * one user-keyed aggregation + one co-partitioned join per step (the
    * user-id shuffle partitioning is reused across stages — no per-user
    * sorting, no sequential scan state, linear in events). Counts are
    * integers end to end; the oracle chains the same per-step CTEs.
    *
    * @return (step, event_type, n_users) — one row per funnel stage
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val byUser = events.select(col(userCol).as("user_id"),
      col(tsCol).as("ts"), col(typeCol).as("et"))
    var cur = byUser.filter(col("et") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    var out = cur.agg(count(lit(1)).as("n_users"))
      .select(lit(1L).as("step"), lit(steps.head).as("event_type"), col("n_users"))
    for ((s, i) <- steps.tail.zipWithIndex) {
      cur = byUser.filter(col("et") === s)
        .join(cur.select(col("user_id"), col("t").as("prev_t")), "user_id")
        .filter(col("ts") > col("prev_t"))
        .groupBy("user_id").agg(min("ts").as("t"))
      out = out.unionAll(cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 2L).as("step"), lit(s).as("event_type"), col("n_users")))
    }
    out
  }

  /** Cohort retention: bucket users by the week of their first `anchorType`
    * event, then count how many of each cohort are active (ANY event) k
    * weeks later — the companion read-out to [[funnel]]. Weeks are integer
    * epoch arithmetic (floor(epoch/604800)), cohorts one user-keyed
    * aggregation, activity a distinct over (cohort, offset, user) — two
    * shuffles total, both user-scale not event-scale after the distinct's
    * map-side combine. Integer counts end to end.
    *
    * @return (cohort_week, week_offset, n_active)
    */
  def retention(events: DataFrame, anchorType: String = "signup",
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type"): DataFrame = {
    val week = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c) / 604800L).cast("long")
    val cohorts = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol).as("user_id"))
      .agg(min(week(col(tsCol))).as("cohort_week"))
    events.select(col(userCol).as("user_id"), week(col(tsCol)).as("w"))
      .join(cohorts, "user_id")
      .filter(col("w") >= col("cohort_week"))
      .select(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
  }

  /** As-of join: pair every `leftType` event with the most recent
    * `rightType` event at-or-before it for the same user — the alignment
    * primitive behind "state at event time" joins (market data, feature
    * lookups, attribution). Spark has no native ASOF; the classic range
    * join explodes quadratically per key, so this uses the union trick:
    * tag both streams, sort once per user by (ts, right-before-left,
    * event_id), and carry the last right row forward with
    * `last(ignoreNulls)` — ONE shuffle keyed on user, linear in events,
    * skew-bounded by per-user event counts. Right rows sort before left
    * rows at equal ts (inclusive as-of, DuckDB `ASOF ... ON l.ts >= r.ts`
    * semantics); ties among right rows resolve to the max event_id.
    *
    * @return (event_id, user_id, ts_left ms, ts_right ms nullable, r_value)
    */
  def asOf(events: DataFrame, leftType: String = "click",
           rightType: String = "purchase"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = events
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("event_type") === leftType).as("is_left"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("is_left").cast("int").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("ts_right",
        last(when(!col("is_left"), unix_millis(col("ts"))), ignoreNulls = true).over(w))
      .withColumn("r_value",
        last(when(!col("is_left"), round(col("value"), 4)), ignoreNulls = true).over(w))
      .filter(col("is_left"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_left"), col("ts_right"), col("r_value"))
  }

  /** Bucketed range join: every `leftType` event paired with the `rightType`
    * events of the same user in the half-open window `[l_ts - win, l_ts)` —
    * the attribution/feature-window primitive ("clicks in the 30 minutes
    * before each purchase"). A naive non-equi join plans as a per-user cross
    * product (BroadcastNestedLoop at worst); instead both sides are binned at
    * the window width and the left side probes its own bin plus the previous
    * one — two window widths always cover a window-length interval — turning
    * the range join into a shuffle equi-join on (user, bin) with an exact
    * residual filter. Linear in events, skew-bounded by per-(user, bin)
    * counts; unmatched left rows survive via the final left join (n = 0).
    *
    * @return (event_id, user_id, ts_ms, n_right, right_value)
    */
  def rangeJoin(events: DataFrame, leftType: String = "purchase",
                rightType: String = "click", windowMinutes: Int = 30): DataFrame = {
    val winMs = windowMinutes * 60000L
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("l_ms"))
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id"), unix_millis(col("ts")).as("r_ms"),
        round(col("value"), 4).as("r_value"))
    val lb = l.withColumn("bin",
      explode(array(floor(col("l_ms") / winMs), floor(col("l_ms") / winMs) - 1)))
    val rb = r.withColumn("bin", floor(col("r_ms") / winMs))
    val matched = lb.join(rb, Seq("user_id", "bin"))
      .filter(col("r_ms") >= col("l_ms") - winMs && col("r_ms") < col("l_ms"))
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_right"), round(sum("r_value"), 4).as("right_value"))
    l.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("l_ms").as("ts_ms"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        round(coalesce(col("right_value"), lit(0.0)), 4).as("right_value"))
  }

  /** Streaming twin of [[rangeJoin]]'s match step: a watermarked
    * stream-stream time-interval join — Spark's native streaming range join.
    * Both sides carry event-time watermarks; the join condition bounds how
    * long either side's state must be retained (right rows expire one
    * watermark horizon past the window, left rows at the horizon), so state
    * is bounded no matter how long the streams run. Inner matches emit in
    * append mode as they arrive. The per-anchor aggregation (n_right /
    * right_value) stays downstream of the sink — chaining a non-windowed
    * aggregate after a stream-stream join is not an append-mode streaming
    * operator; batch [[rangeJoin]] is the end-to-end equivalent.
    */
  def streamingRangeJoin(spark: SparkSession, dir: String, schema: StructType,
                         leftType: String = "purchase",
                         rightType: String = "click",
                         windowMinutes: Int = 30): DataFrame = {
    val src = spark.readStream.schema(schema).parquet(dir)
    val l = src.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_event_id"), col("user_id").as("l_user"),
        col("ts").as("l_ts"))
      .withWatermark("l_ts", "1 hour")
    val r = src.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        round(col("value"), 4).as("r_value"))
      .withWatermark("r_ts", "1 hour")
    l.join(r, expr(
        s"""l_user = r_user AND
           |r_ts >= l_ts - interval $windowMinutes minutes AND
           |r_ts < l_ts""".stripMargin))
      .select(col("l_event_id").as("event_id"), col("l_user").as("user_id"),
        unix_millis(col("l_ts")).as("ts_ms"),
        unix_millis(col("r_ts")).as("r_ms"), col("r_value"))
  }

  /** Streaming twin of [[tumbling]]: same aggregation over a file stream with
    * a watermark for state cleanup. Caller attaches the sink.
    */
  def streamingTumbling(spark: SparkSession, dir: String, schema: StructType,
                        width: String = "1 hour"): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  case class UserTotal(user_id: Long, n: Long, total: Double)

  /** Custom keyed state via mapGroupsWithState — the surface danae never
    * needed (its queue is stateless) but a training-data pipeline does:
    * per-user running totals maintained across micro-batches. State is one
    * small struct per user, partitioned by key; update-mode emission.
    */
  def statefulUserTotals(spark: SparkSession, dir: String,
                         schema: StructType): org.apache.spark.sql.Dataset[UserTotal] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    spark.readStream.schema(schema).parquet(dir)
      .select(col("user_id").as[Long], col("value").as[Double])
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (user, rows, state) =>
          val (dn, dv) = rows.foldLeft((0L, 0.0)) { case ((n, s), r) => (n + 1, s + r._2) }
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val next = UserTotal(user, prev.n + dn,
            BigDecimal(prev.total + dv).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          state.update(next)
          next
      }
  }

  /** Typed JSON property extraction + per-type rollup — the F7 surface
    * (reference keeps payloads as JSON strings; `ingest/ingest.py` decodes
    * ad hoc). `from_json` with an explicit schema is the Spark-first form:
    * schema-checked, codegen'd, corrupt payloads become NULL structs (and
    * are counted, not dropped silently). One map-side-combined aggregate
    * to |event types| rows.
    *
    * @return (event_type, n_events, n_with_k, sum_k, avg_k) by type
    */
  def propsStats(events: DataFrame): DataFrame = {
    val k = from_json(col("props"), "k INT",
      Map.empty[String, String]).getField("k")
    events.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k").cast("long")).as("sum_k"))
      .withColumn("avg_k", when(col("n_with_k") > 0,
        round(col("sum_k").cast("double") / col("n_with_k"), 6)))
      .orderBy("event_type")
  }
}
