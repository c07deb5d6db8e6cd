package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.core.Q
import graft.ops.{AnalyticsOps, CorpusOps, CurateOps, EventTime, GraphOps, LlmPipeline, LlmPipeline2, FeatureOps, MiningOps, MlStatOps, PackOps, TsOps, PrepOps, Relational, Scalars, ScaleOps, SeqOps, SqlSurface, StatOps, TextRank, Udafs, Windows}
import graft.streaming.{CdcApply, Replay, StatefulSessions, StreamJoin}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-file operator inventories; each Q carries both the
  * Spark implementation and (when SQL-expressible) its DuckDB oracle.
  */
object SparkEntry {
  private val all: Seq[Q] =
    Relational.qs ++ Windows.qs ++ Scalars.qs ++ Udafs.qs ++
      EventTime.qs ++ LlmPipeline.qs ++ LlmPipeline2.qs ++ Replay.qs ++
      StatefulSessions.qs ++ StreamJoin.qs ++ ScaleOps.qs ++ CorpusOps.qs ++
      CdcApply.qs ++ GraphOps.qs ++ PackOps.qs ++ PrepOps.qs ++
      AnalyticsOps.qs ++ TextRank.qs ++ CurateOps.qs ++ SqlSurface.qs ++
      SeqOps.qs ++ StatOps.qs ++ FeatureOps.qs ++ MlStatOps.qs ++ TsOps.qs ++ MiningOps.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.key -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.key -> _)).toMap
}
