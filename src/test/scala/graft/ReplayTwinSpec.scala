package graft

import graft.streaming.Replay

/** Streaming-twin verification (SURVEY §5.2 item 4; VERDICT r2 item 1):
  * the Structured Streaming replay pipeline must be loss-free, dup-free
  * and produce EXACTLY the batch twin's result, independent of how the
  * stream was micro-batched.
  */
class ReplayTwinSpec extends SparkSpec {

  test("replay_stream result is identical to its batch twin stream_tumbling") {
    val streaming = run("replay_stream").collect().map(_.toSeq)
    val batch = run("stream_tumbling").collect().map(_.toSeq)
    assert(streaming.length === batch.length)
    assert(streaming.toSeq === batch.toSeq)
  }

  test("stateful-session stream (flatMapGroupsWithState) equals its batch twin") {
    val streaming = run("stream_session_state").collect().map(_.toSeq)
    val batch = run("stream_session").collect().map(_.toSeq)
    assert(streaming.toSeq === batch.toSeq)
  }

  test("replay sink respects the shard layout and the 500-record put-batch cap") {
    import org.apache.spark.sql.functions._
    val out = Replay.replayArchive(spark, s"$sf/events.parquet", nShards = 4)
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(files.nonEmpty && files.forall(f => (0 until 4).exists(i => f.getName == s"shard=$i")))
    val replayedDf = spark.read.parquet(out)
    // every (shard, put_seq) put batch holds ≤ 500 records
    val oversized = replayedDf.groupBy("shard", "put_seq").count()
      .filter(col("count") > 500)
    assert(oversized.isEmpty)
    // put batches are event-time ordered per shard: a batch's max ms
    // never exceeds the next batch's min ms
    val bounds = replayedDf.groupBy("shard", "put_seq")
      .agg(min("ms").as("lo"), max("ms").as("hi"))
      .collect().groupBy(_.getInt(0))
    bounds.values.foreach { rows =>
      val ordered = rows.sortBy(_.getLong(1))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) <= b.getLong(2))
        case _ => ()
      }
    }
    // replay is loss-free and dup-free
    val source = spark.read.parquet(s"$sf/events.parquet").count()
    assert(replayedDf.count() === source)
    // shard routing is a pure function of the partition key
    val byKey = replayedDf
      .select("user_id", "shard").distinct()
      .groupBy("user_id").count()
      .filter(col("count") > 1)
    assert(byKey.isEmpty)
  }
}
