package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object KplProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.config(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val dir = graft.ops.ScaleOps.stageKplArchive(spark, d)
    val raw = spark.read.text(dir)
    def time(label: String)(body: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = body; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[kpl] $label%-28s min=${ts.map(_._1).min}%.2fs n=${ts.head._2}")
    }
    time("read+count")(raw.count())
    time("frames+md5 filter")(graft.ops.ScaleOps.kplFrames(raw).filter(col("good")).count())
    time("full deagg")(graft.ops.ScaleOps.kplDeaggregate(raw).count())
    time("deagg+groupBy pk")(graft.ops.ScaleOps.kplDeaggregate(raw)
      .groupBy("pk").count().count())
    spark.stop()
  }
}
