package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2.9 — streaming-shaped queries, declared through their batch
  * bodies (the oracle sees batch; `graft.streaming.StreamOps` wires the
  * same shapes through readStream for the semantics tests).
  *
  * Scale notes: tumbling/sliding aggregation states are bounded by
  * (#windows × #types); sessionization is one window pass per user
  * partition (lag-gap flag + running sum — the classic linear-scan
  * formulation, no self-join); with a watermark the streaming state store
  * evicts expired windows, so state stays O(active windows) at any volume. */
object StreamingQueries extends QueryGroup {

  private val GapUs  = 1800000000L // 30 min session gap, µs
  private val LateUs = 600000000L  // 10 min watermark, µs

  val queries: Map[String, QFn] = Map(
    "q_stream_tumble" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), dsumR($"value", 4, 6).as("sum_value"))
        .select(unix_millis($"window.start").as("start_ms"), $"event_type", $"n", $"sum_value")
        .orderBy($"start_ms", $"event_type")
    }),

    "q_stream_slide" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "30 minutes", "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis($"window.start").as("start_ms"), $"n")
        .orderBy($"start_ms")
    }),

    "q_stream_session" -> ((s, dir) => {
      import s.implicits._
      val w  = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      val ws = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("new_sess",
          when(lag($"ts_us", 1).over(w).isNull ||
               $"ts_us" - lag($"ts_us", 1).over(w) > GapUs, 1L).otherwise(0L))
        .withColumn("sid", sum($"new_sess").over(ws))
        .groupBy($"user_id", $"sid")
        .agg(min($"ts_us").as("s_start"), max($"ts_us").as("s_end"),
             count(lit(1)).as("s_n"))
      sess.groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
             r4(sum($"s_end" - $"s_start") * lit(1.0) / count(lit(1))).as("avg_dur_us"),
             r4(sum($"s_n") * lit(1.0) / count(lit(1))).as("avg_events"))
        .orderBy($"user_id")
    }),

    "q_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .dropDuplicates("event_id")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // Batch analog of watermark semantics: an event is "late" if it arrives
    // (arrival order = event_id) more than 10 min behind the running max
    // event time. The streaming watermark test lives in StreamingSpec.
    // Two-pass running max, no global window over data rows: fixed
    // event_id blocks carry a local (partitioned) running max; the
    // cross-block prefix max comes from per-block maxima — a window over
    // BLOCK-STATS rows only (#rows/8192 of the data, broadcast back).
    "q_stream_late" -> ((s, dir) => {
      import s.implicits._
      val blockSz = 8192L
      // Explicit single partition: this window sees only the #rows/8192
      // block-stats rows (one task by design; at extreme volumes the same
      // blocking recurses to blocks-of-blocks). The key is constant-valued
      // but non-foldable so EliminateWindowPartitions does not strip it
      // back to an unpartitioned window.
      val wPrevBlk = Window.partitionBy($"blk" * 0).orderBy($"blk")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wLocal = Window.partitionBy($"blk").orderBy($"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val e = t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("blk", floor($"event_id" / blockSz).cast("long"))
      val bstats = e.groupBy($"blk").agg(max($"ts_us").as("bmax"))
        .withColumn("pmax", max($"bmax").over(wPrevBlk))
        .select($"blk", $"pmax")
      e.join(broadcast(bstats), Seq("blk"))
        // greatest() ignores NULLs: first row of a block falls back to the
        // previous blocks' max, first block to local-only — exactly the
        // strict-predecessor running max.
        .withColumn("hwm", greatest(max($"ts_us").over(wLocal), $"pmax"))
        .withColumn("late", $"hwm".isNotNull && $"ts_us" < $"hwm" - LateUs)
        .groupBy($"event_type")
        .agg(count(when($"late", 1)).as("n_late"),
             count(when(!$"late", 1)).as("n_ontime"))
        .orderBy($"event_type")
    }),

    // Batch body of the stream-stream interval join (StreamOps
    // .attributionJoin): purchases within 20 min after a click by the same
    // user, aggregated per user. StreamingSpec proves batch ≡ stream on
    // the join pairs.
    "q_stream_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts")).drop("ts")
      val pairs = graft.streaming.StreamOps.attributionJoin(
        ev.filter($"event_type" === "click"),
        ev.filter($"event_type" === "purchase"))
      pairs.groupBy($"user_id")
        .agg(count(lit(1)).as("n_pairs"), dsumR($"value", 4, 6).as("attr_value"))
        .orderBy($"user_id")
    }),

    // Batch analog of per-user running state (last type, cumulative value).
    "q_stream_state" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("last_type", last($"event_type").over(w))
        .groupBy($"user_id")
        .agg(max($"last_type").as("last_type"), // constant per user
             count(lit(1)).as("n_events"),
             dsumR($"value", 4, 6).as("total_value"))
        .orderBy($"user_id")
    }),

    // Stream-stream AS-OF enrichment, batch-declared: the SAME
    // StreamOps.asOfEnrich body StreamingSpec drives through MemoryStream
    // (interval join + per-buy windowed max) — each purchase annotated
    // with the most recent prior click by the same user within 20 min.
    // Tie at one c_us breaks by max click_id; oracle mirrors it with a
    // (c_us DESC, click_id DESC) window rank (the max_by-tie discipline).
    "q_stream_asof" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").withColumn("ts_us", unix_micros($"ts"))
      graft.streaming.StreamOps.asOfEnrich(
          ev.filter($"event_type" === "click"),
          ev.filter($"event_type" === "purchase"))
        .orderBy($"buy_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_stream_tumble" ->
      s"""SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) * 3600000 AS start_ms,
         |  event_type, COUNT(*) AS n, ${oSumR("value", 4, 6)} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY start_ms, event_type""".stripMargin,

    "q_stream_slide" ->
      """WITH e AS (
        |  SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 600000) * 600000 AS b FROM events),
        |s AS (SELECT b AS st FROM e
        |      UNION ALL SELECT b - 600000 FROM e
        |      UNION ALL SELECT b - 1200000 FROM e)
        |SELECT st AS start_ms, COUNT(*) AS n FROM s GROUP BY st ORDER BY start_ms""".stripMargin,

    "q_stream_session" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w IS NULL
        |           OR epoch_us(CAST(ts AS TIMESTAMP))
        |              - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)),
        |sid AS (
        |  SELECT user_id, ts_us,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT user_id, sid, MIN(ts_us) AS s_start, MAX(ts_us) AS s_end,
        |    COUNT(*) AS s_n
        |  FROM sid GROUP BY user_id, sid)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  round(SUM(s_end - s_start) * 1.0 / COUNT(*), 4) AS avg_dur_us,
        |  round(SUM(s_n) * 1.0 / COUNT(*), 4) AS avg_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_dedup" ->
      """SELECT event_type, COUNT(*) AS n
        |FROM (SELECT DISTINCT ON (event_id) * FROM events ORDER BY event_id) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_late" ->
      """WITH h AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    MAX(epoch_us(CAST(ts AS TIMESTAMP))) OVER (ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM events)
        |SELECT event_type,
        |  COUNT(*) FILTER (WHERE hwm IS NOT NULL AND ts_us < hwm - 600000000) AS n_late,
        |  COUNT(*) FILTER (WHERE NOT (hwm IS NOT NULL AND ts_us < hwm - 600000000)) AS n_ontime
        |FROM h GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stream_state" ->
      s"""WITH l AS (
         |  SELECT user_id, value,
         |    last_value(event_type) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
         |  FROM events)
         |SELECT user_id, MAX(last_type) AS last_type, COUNT(*) AS n_events,
         |  ${oSumR("value", 4, 6)} AS total_value
         |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_join" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_id, event_type, value,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
         |  FROM events),
         |c AS (SELECT user_id, ts_us AS c_us FROM ev WHERE event_type = 'click'),
         |b AS (SELECT user_id, ts_us AS b_us, value FROM ev WHERE event_type = 'purchase')
         |SELECT user_id, COUNT(*) AS n_pairs, ${oSumR("value", 4, 6)} AS attr_value
         |FROM c JOIN b USING (user_id)
         |WHERE b_us >= c_us AND b_us < c_us + 1200000000
         |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_asof" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS c_us
        |      FROM e WHERE event_type = 'click'),
        |b AS (SELECT user_id, event_id AS buy_id, ts_us AS b_us
        |      FROM e WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT b.user_id, buy_id, b_us, click_id, c_us,
        |    row_number() OVER (PARTITION BY buy_id
        |                       ORDER BY c_us DESC, click_id DESC) AS rn
        |  FROM b JOIN c ON b.user_id = c.user_id
        |    AND c_us <= b_us AND c_us > b_us - 20 * 60 * 1000000)
        |SELECT user_id, buy_id, b_us, click_id AS asof_click, c_us AS asof_us
        |FROM j WHERE rn = 1 ORDER BY buy_id""".stripMargin
  )
}
