package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.{OSql, Q, Tables, TmpDirs, Det}

/** Streaming CDC apply — the `foreachBatch` MERGE sink that
  * `cdc_upsert`'s scaladoc names as the production incremental path,
  * run for real: a changelog (versioned updates + deletes) streams in
  * micro-batches and each batch MERGES into a keyed, bucket-partitioned
  * table — latest version wins, deletes become tombstones.
  *
  * The merge inside each epoch is BUCKET-SCOPED, which is the whole
  * scale point: the table is laid out `bucket = pmod(key, 16)`; a batch
  * first computes its touched buckets (a tiny broadcast), reads back
  * ONLY those buckets of the current table, merges (hash by key, one
  * `row_number` window by version), and rewrites just the touched
  * partitions via dynamic partition overwrite. Per-epoch IO is
  * proportional to the buckets the changelog touched, never the table —
  * the same economics a MERGE INTO on a table format (Delta/Iceberg)
  * buys; this is that pattern expressed in plain parquet + dynamic
  * overwrite. At 100 TB the bucket count rises so each partition stays
  * executor-sized; the per-epoch plan shape is unchanged.
  *
  * Tombstones: deletes are RETAINED in the table (op = 'D') and
  * filtered at read time — dropping them during the merge would let a
  * late lower-version update resurrect a deleted key. Latest-version-
  * wins is commutative across batches, so the final table is
  * independent of how the changelog was micro-batched (exercised
  * throttled in ReplayTwinSpec) — which is what lets the driver
  * hash-compare against the SAME batch oracle as `cdc_upsert`.
  */
object CdcApply {

  /** Stage the deterministic changelog (the same construction as
    * `cdc_upsert`: full snapshot at v0, every 10th key repriced +10%
    * at v1, every 17th deleted at v2) as an append-grown parquet dir —
    * the stream's source archive. The changelog is FIXTURE, not the
    * operator (a pure function of the source dir), so it stages once
    * per JVM through [[graft.core.IndexCache.dir]] — three sequential
    * parquet writes were charging ~1/3 of the key's bench time to
    * archive staging instead of the merge under test.
    */
  private def stageChangelog(s: SparkSession, d: String): String =
    graft.core.IndexCache.dir(s"cdc-changelog|$d") {
      import s.implicits._
      val base = Tables.t(s, d, "orders")
        .select($"o_orderkey".as("key"), $"o_totalprice".as("price"),
          $"o_orderstatus".as("status"), lit(0L).as("ver"), lit("U").as("op"))
      val dir = TmpDirs.dir("cdc-changelog")
      base.write.mode("overwrite").parquet(dir)
      base.filter($"key" % 10 === 0)
        .select($"key", ($"price" * lit(1.1)).as("price"), $"status",
          lit(1L).as("ver"), lit("U").as("op"))
        .write.mode("append").parquet(dir)
      base.filter($"key" % 17 === 0)
        .select($"key", $"price", $"status", lit(2L).as("ver"), lit("D").as("op"))
        .write.mode("append").parquet(dir)
      dir
    }

  private val Buckets = 16

  /** Run the streaming apply over the staged changelog and return the
    * final merged table (tombstones filtered). maxFilesPerTrigger > 0
    * forces a multi-epoch apply — the incremental-merge fidelity path.
    */
  private[graft] def applyChangelog(
      s: SparkSession, d: String, maxFilesPerTrigger: Int = 0): DataFrame =
    applyChangelogDir(s, stageChangelog(s, d), maxFilesPerTrigger)

  /** The same streaming MERGE sink over an ARBITRARY staged changelog
    * dir — the surface PropertySpec's generated-changelog law drives:
    * random updates/deletes/redeliveries in random micro-batch splits
    * must land on exactly the batch-twin state.
    */
  private[graft] def applyChangelogDir(
      s: SparkSession, chDir: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    import s.implicits._
    val table = TmpDirs.dir("cdc-table")
    val ckpt = TmpDirs.dir("cdc-ckpt")
    val reader = s.readStream.schema(s.read.parquet(chDir).schema)
    if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val q = reader.parquet(chDir).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ss = batch.sparkSession
        val b = batch.withColumn("bucket", pmod(col("key"), lit(Buckets)))
        val touched = b.select("bucket").distinct()
        // Current state of ONLY the touched buckets. Before the first
        // commit the dir has no data files — detect that by LISTING,
        // not by swallowing read exceptions: a blanket catch would
        // silently RESET the table on a genuinely corrupt read, which
        // for a merge sink is data loss dressed as an empty first epoch.
        val hasData = Option(new java.io.File(table).listFiles())
          .exists(_.exists(f => f.isDirectory && f.getName.startsWith("bucket=")))
        val cur =
          if (hasData)
            ss.read.parquet(table).join(broadcast(touched), Seq("bucket"), "left_semi")
          else b.filter(lit(false))
        val w = Window.partitionBy(col("key")).orderBy(col("ver").desc)
        // materialize BEFORE the overwrite destroys the files the merge
        // read from (localCheckpoint = executor-memory lineage cut)
        val merged = cur.unionByName(b)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .localCheckpoint(true)
        merged.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .parquet(table)
      }
      .start()
    q.awaitTermination()
    s.read.parquet(table).filter($"op" =!= "D")
  }

  private val streamCdcApply = Q(
    "stream_cdc_apply",
    (s, d) => {
      import s.implicits._
      if (Tables.t(s, d, "orders").isEmpty)
        Seq.empty[(String, Long, Double)].toDF("status", "cnt", "total_price")
      else applyChangelog(s, d)
        .groupBy("status")
        .agg(count(lit(1)).as("cnt"), Det.moneySum($"price").as("total_price"))
        .orderBy("status")
    },
    // identical oracle to the batch twin cdc_upsert: the streaming
    // apply must land on exactly the batch MERGE result
    Some("WITH base AS (SELECT o_orderkey AS key, o_totalprice AS price, " +
      "o_orderstatus AS status, 0 AS ver, 'U' AS op FROM orders), " +
      "rep AS (SELECT key, price * 1.1 AS price, status, 1 AS ver, 'U' AS op " +
      "FROM base WHERE key % 10 = 0), " +
      "del AS (SELECT key, price, status, 2 AS ver, 'D' AS op " +
      "FROM base WHERE key % 17 = 0), " +
      "merged AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY ver DESC) AS rn " +
      "FROM (SELECT * FROM base UNION ALL SELECT * FROM rep UNION ALL SELECT * FROM del)) " +
      "SELECT status, count(*) AS cnt, " + OSql.msum("price") + " AS total_price " +
      "FROM merged WHERE rn = 1 AND op <> 'D' GROUP BY 1 ORDER BY 1"))

  val qs: Seq[Q] = Seq(streamCdcApply)
}
