package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for `dedup_cluster`'s connected-components fold: at
  * the regenerated 100-copy corpus the compressed min-label loop blew
  * its 17-pass cap (it measured 6 rounds on the previous corpus) and
  * paid the starContraction fallback on top. This prints the per-round
  * changed-label count over the REAL sf10 star graph so the round
  * dynamics are observable. Not part of the declared surface; run via
  * `runMain graft.ops.CcProbe [sfDir] [maxRounds]`.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/sf10")
    val maxIter = args.lift(1).flatMap(_.toIntOption).getOrElse(24)
    val spark = graft.core.Sessions.config(
      SparkSession.builder().master("local[16]"), "16").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = LlmPipeline.starEdges(spark, d).localCheckpoint(true)
    val nE = edges.count()
    val nV = edges.select($"v").distinct().count()
    println(s"[cc] edges=$nE verts=$nV (symmetric list)")
    // degree profile of the hub graph
    edges.groupBy($"v").agg(count(lit(1)).as("deg"))
      .agg(max($"deg"), expr("percentile_approx(deg, array(0.5, 0.99))"))
      .show(false)
    var labels = edges.select($"v").distinct()
      .select($"v", $"v".as("lbl")).localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select($"v".as("u"), $"lbl".as("ulbl")), "u")
        .groupBy("v").agg(min($"ulbl").as("nmin"))
      val lblOfLbl = labels.select($"v".as("lbl"), $"lbl".as("plbl"))
      val stepped = labels.join(nbrMin, Seq("v"), "left")
        .join(lblOfLbl, Seq("lbl"), "left")
        .select($"v", $"lbl",
          least($"lbl", coalesce($"nmin", $"lbl"),
            coalesce($"plbl", $"lbl")).as("nlbl"))
        .localCheckpoint(true)
      changed = stepped.filter($"nlbl" =!= $"lbl").count()
      labels = stepped.select($"v", $"nlbl".as("lbl"))
      iter += 1
      println(s"[cc] round=$iter changed=$changed")
    }
    val comps = labels.select($"lbl").distinct().count()
    println(s"[cc] rounds=$iter components=$comps")
    spark.stop()
  }
}
