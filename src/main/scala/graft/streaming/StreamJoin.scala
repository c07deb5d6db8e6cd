package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Det, OSql, Q, Tables, TmpDirs}

/** Stream-stream INTERVAL join — the Structured Streaming join family
  * (conversion funnels, attribution, request/response pairing): every
  * purchase is matched to the clicks of the same user in the preceding
  * 30 minutes, both sides being live streams.
  *
  * Spark semantics exercised: watermarks on BOTH inputs plus an
  * event-time range in the join condition — exactly what lets the
  * engine bound the join state. Each side buffers a row only until the
  * other side's watermark passes the end of its match range, so state
  * is O(rows in the watermark horizon) per user-key range, sharded by
  * the equi-key (user_id) across executors — never the full history.
  * Inner-join matches emit immediately (emission is not gated on the
  * watermark; the watermark only evicts state). Batch-equality is NOT
  * unconditional, though: a row arriving in a later micro-batch BEHIND
  * the advanced watermark is dropped as late, so a multi-epoch run over
  * files that arrive out of event-time order can diverge from the batch
  * oracle. The runs here are batch-equal because the unthrottled
  * AvailableNow trigger ingests the whole archive in a single data
  * micro-batch — no second batch exists to be late — and [[run]]
  * fails loudly if that single-batch condition ever stops holding.
  *
  * The aggregation over the matched pairs runs batch-side on the sink
  * table: counts are exact and the delay sum is exact integer-in-double
  * (delays ≤ 1.8e6 ms, so partial sums stay far below 2^53), making the
  * average order-independent.
  */
object StreamJoin {

  private def side(
      s: SparkSession, glob: String,
      schema: org.apache.spark.sql.types.StructType,
      tpe: String, prefix: String): DataFrame =
    s.readStream.schema(schema).parquet(glob)
      .filter(col("event_type") === tpe)
      .select(col("event_id").as(s"${prefix}_id"),
        col("user_id").as(s"${prefix}_user"),
        graft.core.Tables.msExpr(schema).as(s"${prefix}_ms"))
      .withColumn(s"${prefix}_ets", timestamp_millis(col(s"${prefix}_ms")))
      .withWatermark(s"${prefix}_ets", "1 hour")

  /** Run the click→purchase interval join as a real two-stream query;
    * returns the matched pairs (one row per click/purchase pair).
    *
    * The sink is an executor-side parquet dir, NOT the memory sink: the
    * un-aggregated pair set is join-output-sized (a per-user product
    * within the window), and a memory table would pin it in the driver
    * for the session's lifetime. Parquet under [[TmpDirs]] is bounded,
    * cleaned up, and exactly what the real deployment's sink would be.
    */
  def run(s: SparkSession, eventsPath: String,
      joinType: String = "inner"): DataFrame = {
    Tables.ensureNanosConf(s)
    val schema = s.read.parquet(Tables.escapeGlob(eventsPath)).schema
    val glob = Tables.srcGlob(eventsPath)
    val clicks = side(s, glob, schema, "click", "c")
    val purchases = side(s, glob, schema, "purchase", "p")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ets") >= col("c_ets") &&
        col("p_ets") <= col("c_ets") + expr("INTERVAL 30 MINUTES"),
      joinType)
      .select(col("c_user").as("user_id"), col("c_id"), col("c_ms"), col("p_ms"))
    val ckpt = TmpDirs.dir("sjoin-ckpt")
    val out = TmpDirs.dir("sjoin-out")
    // A stream-stream join runs FOUR state stores per shuffle partition
    // (keyToNumValues/keyWithIndexToValue × both sides); scope the state
    // shard count to the stream. The trailing no-data micro-batch is
    // LOAD-BEARING exactly for the outer join — unmatched rows emit
    // only when the advanced watermark proves no match can arrive, and
    // with AvailableNow that advance happens in the no-data batch — so
    // it stays on there; the inner join emits matches immediately and
    // skips it (Sessions.streamScope).
    val q = graft.core.Sessions.streamScope(s, noDataBatch = joinType != "inner") {
      val q0 = joined.writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q0.awaitTermination()
      q0
    }
    // Oracle-equality precondition (see the scaladoc above): the whole
    // archive must have been ingested in ONE data micro-batch, else
    // watermark lateness across batches could have dropped rows. Fail
    // loudly rather than hand a silently-diverged result to the caller.
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    require(dataBatches <= 1,
      s"stream-stream join ran $dataBatches data micro-batches; " +
        "batch-equality with the range-join oracle holds only for a " +
        "single-batch AvailableNow run")
    // explicit schema: a zero-match run leaves no files to infer from
    s.read.schema(joined.schema).parquet(out)
  }

  private val streamJoinInterval = Q(
    "stream_join_interval",
    (s, d) => {
      import s.implicits._
      // Tables.events heals the nanos-timestamp conf before the raw
      // streaming reads touch the TIMESTAMP(NANOS) parquet.
      if (Tables.eventsEmpty(s, d))
        Seq.empty[(Long, Long, Double)].toDF("hour_start", "cnt", "avg_delay_ms")
      else
        run(s, s"$d/events.parquet")
          // integer `div`, not `/`: double division of epoch-ms values
          // then a truncating cast can land one hour off at bucket
          // boundaries; div is exact in both engines (// in DuckDB)
          .groupBy((expr(Det.fdivExpr("c_ms", "3600000")) * 3600L).as("hour_start"))
          .agg(count(lit(1)).as("cnt"),
            Det.dround(sum($"p_ms" - $"c_ms").cast("double") / count(lit(1)), 4)
              .as("avg_delay_ms"))
          .orderBy("hour_start")
    },
    Some("SELECT CAST((epoch_ms(c.ts) // 3600000) * 3600 AS BIGINT) AS hour_start, " +
      "count(*) AS cnt, " +
      OSql.sround("CAST(SUM(epoch_ms(p.ts) - epoch_ms(c.ts)) AS DOUBLE) / count(*)", 4) +
      " AS avg_delay_ms " +
      "FROM events c JOIN events p ON p.user_id = c.user_id " +
      "AND c.event_type = 'click' AND p.event_type = 'purchase' " +
      "AND epoch_ms(p.ts) >= epoch_ms(c.ts) " +
      "AND epoch_ms(p.ts) <= epoch_ms(c.ts) + 1800000 " +
      "GROUP BY 1 ORDER BY 1"))

  /** Stream-stream LEFT OUTER interval join — the "clicks that never
    * converted" side of the funnel, as a live two-stream query. The
    * semantics Spark adds over the inner join: an unmatched left row is
    * held in state until the global watermark proves no matching
    * purchase can still arrive (watermark past the end of its 30-minute
    * match window), THEN emitted with nulls. Clicks whose window is
    * still open when the archive ends are NOT emitted — the streaming
    * horizon, faithfully mirrored in the oracle: the final watermark is
    * min(max click time, max purchase time) − 1 h (per-input watermarks
    * are each side's max event time minus the declared delay; the
    * global watermark is their min), and an unmatched click appears iff
    * its window end sits strictly below that watermark. The boundary
    * (strict <) is pinned by an EdgeCaseSpec fixture with a click whose
    * window end equals the final watermark exactly (plus the probed
    * epoch-0 caveat documented there).
    *
    * The emitted-pairs side is watermark-independent (matches emit
    * immediately); only null-row emission is horizon-gated, which is
    * exactly the operational difference this key exists to verify.
    */
  private val streamJoinOuter = Q(
    "stream_join_outer",
    (s, d) => {
      import s.implicits._
      if (Tables.eventsEmpty(s, d))
        Seq.empty[(Long, Long, Long)].toDF("hour_start", "n_pairs", "n_unmatched")
      else
        run(s, s"$d/events.parquet", "left_outer")
          .groupBy((expr(Det.fdivExpr("c_ms", "3600000")) * 3600L).as("hour_start"))
          .agg(count($"p_ms").as("n_pairs"),
            sum(when($"p_ms".isNull, 1L).otherwise(0L)).cast("long")
              .as("n_unmatched"))
          .orderBy("hour_start")
    },
    Some("WITH c AS (SELECT event_id, user_id, epoch_ms(ts) AS ms " +
      "FROM events WHERE event_type = 'click'), " +
      "p AS (SELECT user_id, epoch_ms(ts) AS ms " +
      "FROM events WHERE event_type = 'purchase'), " +
      "wm AS (SELECT least((SELECT max(ms) FROM c), (SELECT max(ms) FROM p)) " +
      "- 3600000 AS w), " +
      "j AS (SELECT c.ms AS c_ms, p.ms AS p_ms FROM c JOIN p " +
      "ON p.user_id = c.user_id AND p.ms >= c.ms AND p.ms <= c.ms + 1800000), " +
      "um AS (SELECT c.ms AS c_ms FROM c, wm " +
      "WHERE c.ms + 1800000 < wm.w AND NOT EXISTS (SELECT 1 FROM p " +
      "WHERE p.user_id = c.user_id AND p.ms >= c.ms " +
      "AND p.ms <= c.ms + 1800000)), " +
      "allr AS (SELECT c_ms, p_ms FROM j " +
      "UNION ALL SELECT c_ms, NULL AS p_ms FROM um) " +
      "SELECT CAST((c_ms // 3600000) * 3600 AS BIGINT) AS hour_start, " +
      "count(p_ms) AS n_pairs, " +
      "CAST(sum(CASE WHEN p_ms IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
      "AS n_unmatched FROM allr GROUP BY 1 ORDER BY 1"))

  val qs: Seq[Q] = Seq(streamJoinInterval, streamJoinOuter)
}
