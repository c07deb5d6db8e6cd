package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan (and
  * optionally times) one named query from SparkEntry. Usage:
  *   runMain graft.Explain <queryKey> [sfDir] [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.Sessions.config(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(key)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("time")) {
      // cold run then warm run — the warm number is what Bench (which
      // warms the session first) will see.
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(key)(spark, sfDir).count()
        println(f"[explain] $key run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
