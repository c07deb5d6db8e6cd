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
    val out = Replay.replayArchive(spark, s"$sf/events.parquet", nShards = 4)
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(files.nonEmpty && files.forall(f => (0 until 4).exists(i => f.getName == s"shard=$i")))
    // every put-batch file holds ≤ 500 records
    val parts = files.flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    parts.foreach { p =>
      val n = spark.read.parquet(p.getAbsolutePath).count()
      assert(n <= 500, s"${p.getName} has $n rows")
    }
    // replay is loss-free and dup-free
    val replayed = spark.read.parquet(out).count()
    val source = spark.read.parquet(s"$sf/events.parquet").count()
    assert(replayed === source)
    // shard routing is a pure function of the partition key
    val byKey = spark.read.parquet(out)
      .select("user_id", "shard").distinct()
      .groupBy("user_id").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1)
    assert(byKey.isEmpty)
  }
}
