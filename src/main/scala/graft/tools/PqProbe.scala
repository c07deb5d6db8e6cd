package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.config(
      SparkSession.builder().master("local[16]"), "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = "target/sf1"
    val probes = Seq(0L, 1L, 2L)
    val exact = graft.ops.LlmPipeline2.exactProbeTool(spark, d, probes).toSet
    val rec = graft.SparkEntry.queries("sim_ann_recall")(spark, d).collect()
    rec.foreach(r => println(f"[pq] sf1 ${r.getString(0)}%4s recall=${r.getDouble(2)}%.3f"))
    for ((kc, rr) <- Seq((16, 800))) {
      val t0 = System.nanoTime()
      val approx = graft.ops.LlmPipeline2.pqProbeTool(spark, d, kc, probes, rr)
      val overlap = approx.count(exact.contains)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pq] K=$kc%3d R=$rr%4d recall=${overlap / 30.0}%.3f t=$dt%.1fs")
    }
    spark.stop()
  }
}
