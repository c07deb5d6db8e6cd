package graft

import org.apache.spark.sql.functions._

/** Scale-proofing regressions for the round-4 rewrites: the 64-bit
  * SimHash and the banded random-hyperplane embedding LSH must (a) still
  * find true near-duplicates and (b) generate provably sub-quadratic
  * candidate volumes; the native session_window operator must agree with
  * its lag+cumsum twin; the gzip NDJSON round trip must be lossless.
  * All tests drive the REAL `SparkEntry.queries` functions.
  */
class ScaleProofSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, text) => (id, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("simhash-64: exact and near-identical docs collide within Hamming 3") {
    val shared = (0 until 200).map(i => s"tok$i").mkString(" ")
    val dir = stageTables("documents" -> docsDf(Seq(
      1L -> shared,
      2L -> shared, // exact dup → Hamming 0
      3L -> (shared + " extratoken"), // near dup → tiny Hamming
      4L -> (100 until 300).map(i => s"other$i").mkString(" "),
      5L -> (500 until 700).map(i => s"far$i").mkString(" "))))
    val pairs = run("dedup_simhash", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) === 0L)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3L)
    assert(!pairs.contains((4L, 5L)) && !pairs.contains((1L, 4L)))
  }

  test("simhash-64: candidate volume is far below the all-pairs product") {
    val n = graft.core.Tables.t(spark, sf, "documents").count()
    val cand = graft.ops.LlmPipeline2.simhashCandidates(spark, sf).count()
    // 4 bands × cap 100 bounds candidates at O(N·cap); on real data the
    // 16-bit chunks are near-unique so candidates are a sliver of N²/2.
    assert(cand <= 4L * 100L * n)
    assert(cand < n * (n - 1) / 2 / 10, s"cand=$cand n=$n")
  }

  test("embedding LSH: candidate volume is guard-bounded and sub-quadratic") {
    val n = graft.core.Tables.t(spark, sf, "embeddings").count()
    val cand = graft.ops.LlmPipeline2.embCandidates(spark, sf).count()
    assert(cand <= 8L * 100L * n) // bands × hot-bucket cap × N
    assert(cand < n * (n - 1) / 2 / 4, s"cand=$cand n=$n")
  }

  test("embedding LSH: near-identical vectors land in the dedup output") {
    // vec 2 = vec 1 with one component nudged; vec 3 orthogonal-ish.
    val base = (1 to 64).map(i => if (i % 2 == 0) 0.125f else -0.125f)
    val near = base.updated(0, -0.120f)
    val far = (1 to 64).map(i => if (i % 3 == 0) 0.2f else 0.01f)
    val dir = stageTables("embeddings" ->
      Seq((1L, base, 0), (2L, near, 0), (3L, far, 1))
        .toDF("vec_id", "embedding", "label")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val pairs = run("dedup_embedding_cosine", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("native session_window agrees with the lag+cumsum sessionization twin") {
    val native = run("stream_session_window")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val twin = run("stream_session").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native === twin)
  }

  test("dedup_cluster: min-label propagation closes a transitive chain") {
    // B is the concatenation A ++ C of two disjoint docs: the MinHash
    // bands propose A–B and B–C but NOT A–C (verified: this exact
    // fixture yields exactly those two candidate edges — md5 makes it
    // stable), so only multi-hop propagation puts all three in one
    // cluster labeled by the smallest doc_id. Doc 9 is unrelated (no
    // edges) and must not appear in the output at all.
    val a = (0 until 40).map(i => s"a0x$i").mkString(" ")
    val c = (0 until 40).map(i => s"c0y$i").mkString(" ")
    val b = a + " " + c
    val far = (0 until 60).map(i => s"z$i").mkString(" ")
    val dir = stageTables("documents" -> docsDf(Seq(
      1L -> a, 2L -> b, 3L -> c, 9L -> far)))
    val rows = run("dedup_cluster", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    assert(rows.values.toSet === Set((1L, 3L)))
    // sanity: A and C really do NOT collide directly — the cluster is a
    // propagation result, not one big band bucket
    val cand = run("dedup_near_minhash", dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cand.contains((1L, 3L)))
    assert(cand.contains((1L, 2L)) && cand.contains((2L, 3L)))
  }

  test("heavy-hitters sketch keeps the majority token through evictions and merges") {
    import org.apache.spark.unsafe.types.UTF8String
    // capacity 2, stream dominated by "hot": Misra-Gries guarantees any
    // token with frequency > n/(cap+1) = n/3 survives — drive update
    // and an out-of-order merge directly against the aggregate class.
    val agg = graft.functions.HeavyHitters(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = true), 2)
    def feed(tokens: Seq[String]) = {
      val buf = agg.createAggregationBuffer()
      tokens.foreach { t =>
        agg.update(buf,
          org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(t)))
      }
      buf
    }
    val b1 = feed(Seq("hot", "a", "hot", "b", "hot", "c", "hot"))
    val b2 = feed(Seq("hot", "d", "hot", "e", "hot"))
    assert(b1.size <= 2 && b2.size <= 2)
    // serialization round trip (the shuffle path) then merge
    val merged = agg.merge(agg.deserialize(agg.serialize(b1)),
      agg.deserialize(agg.serialize(b2)))
    assert(merged.size <= 2)
    assert(merged.keys.map(_.toString).toSet.contains("hot"))
  }

  test("agg_heavy_hitters returns exactly the above-threshold set on a skewed fixture") {
    // 10 heavy tokens (counts 50..41, all above n/65 of n=655) over a
    // 200-singleton tail: the sketch must retain every heavy token
    // through evictions and the exact re-count must discard the whole
    // tail (counts of 1 are far below the support threshold).
    val words = (0 until 10).flatMap(i => Seq.fill(50 - i)(s"hh$i")) ++
      (0 until 200).map(i => s"tail$i")
    val dir = stageTables("documents" -> docsDf(Seq(1L -> words.mkString(" "))))
    val got = run("agg_heavy_hitters", dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === (0 until 10).map(i => (s"hh$i", (50 - i).toLong)))
  }

  test("sink_compact: 64 ingest fragments compact to size-targeted files, losslessly") {
    val (summary, before, after) = graft.ops.ScaleOps.compactRun(spark, sf)
    assert(before === 64, "the staged small-file problem should be 64 fragments")
    assert(after >= 1 && after < 8, s"compaction should merge to a few files, got $after")
    // lossless: the exact id checksum over the compacted output equals
    // the checksum over the original archive
    val compacted = summary.agg(sum($"sum_id")).collect()(0).getLong(0)
    val original = graft.core.Tables.events(spark, sf)
      .agg(sum($"event_id")).collect()(0).getLong(0)
    assert(compacted === original)
  }

  test("scan_text_gz round trip is lossless vs the parquet archive") {
    val viaGz = run("scan_text_gz").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val direct = graft.core.Tables.events(spark, sf)
      .select($"event_type", $"value",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum($"k").as("sum_k"),
        graft.core.Det.moneySum($"value").as("total_value"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(viaGz === direct)
  }
}
