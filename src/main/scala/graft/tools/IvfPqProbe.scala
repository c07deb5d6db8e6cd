package graft.tools
import org.apache.spark.sql.SparkSession
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.config(
      SparkSession.builder().master("local[16]"), "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probes = Seq(0L, 1L, 2L)
    for (d <- Seq("/root/testdata/sf0.1", "target/sf1")) {
      val exact = graft.ops.LlmPipeline2.exactProbeTool(spark, d, probes).toSet
      val (k, np) = graft.ops.LlmPipeline2.ivfDerivedParams(spark, d)
      for (rr <- Seq(40, 200, 400)) {
        val overlap = probes.map { p =>
          val ids = graft.ops.LlmPipeline2
            .ivfPqTopK(spark, d, numCells = k, nProbe = np, probeId = p, rerank = rr)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          ids.count(v => exact.contains((p, v)))
        }.sum
        println(f"[ivfpq] $d R=$rr recall=${overlap / 30.0}%.3f")
      }
    }
    spark.stop()
  }
}
