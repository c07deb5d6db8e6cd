package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for `sql_recursive_cte`'s UnionLoop (VERDICT r14 ask
  * #3): times the recursive walk with and without a broadcast hint on
  * the frontier self-reference, so the frontier-pruning decision is
  * measured, not guessed. Not part of the declared surface; run via
  * `runMain graft.tools.RcteProbe [sfDir] [hint|nohint]`.
  */
object RcteProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/sf1")
    val hint = args.length > 1 && args(1) == "hint"
    val spark = graft.core.Sessions.config(
      SparkSession.builder().master("local[16]"), "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nPart = args.find(_.startsWith("p")).flatMap(_.drop(1).toIntOption)
    val base = graft.core.Tables.events(spark, d)
      .filter(col("user_id").isNotNull && col("user_id") >= 0)
      .select(col("user_id").as("u")).distinct()
    nPart.fold(base)(base.repartition(_))
      .localCheckpoint(true)
      .createOrReplaceTempView("rc_users")
    if (args.length > 2) args(2).split(",").foreach {
      case "nocodegen" => spark.conf.set("spark.sql.codegen.wholeStage", "false")
      case "noaqe" => spark.conf.set("spark.sql.adaptive.enabled", "false")
      case other => System.err.println(s"[probe] unknown knob $other")
    }
    val h = if (hint) "/*+ BROADCAST(h) */ " else ""
    val sql =
      "WITH RECURSIVE h(u, depth) AS (" +
        "SELECT u, CAST(0 AS BIGINT) FROM rc_users " +
        "WHERE u = 0 OR (u div 2) NOT IN (SELECT u FROM rc_users) " +
        "UNION ALL " +
        s"SELECT $h c.u, h.depth + 1 FROM rc_users c JOIN h ON c.u > 0 AND (c.u div 2) = h.u) " +
        "SELECT depth, CAST(count(*) AS BIGINT) AS n_users FROM h GROUP BY depth ORDER BY depth"
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val df = spark.sql(sql)
      val n = df.collect().map(_.getLong(1)).sum
      println(f"[probe] hint=$hint rep=$rep rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (rep == 1)
        println(df.queryExecution.executedPlan.toString.split("\n").take(50).mkString("\n"))
    }
    spark.stop()
  }
}
