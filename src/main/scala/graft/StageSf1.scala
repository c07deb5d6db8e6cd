package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 synthesizer for the SCALING-LAW bench (VERDICT r10
  * ask #2): `/root/testdata` tops out at sf0.1, so every 100×-scale
  * claim was a plan-shape argument. This main derives a ~10× corpus
  * from sf0.1 — no RNG, no network, pure column arithmetic — so the
  * bench can measure sf0.1 → sf1 time ratios per key.
  *
  * Construction: `copies` (default 10) disjoint images of the source,
  * every id-space column offset by `copy · 10⁷` (far above the sf0.1
  * max id 149,999) with foreign keys remapped IDENTICALLY, so
  * per-copy join selectivity, group cardinality per key, and the
  * events time range are preserved exactly while id spaces, user
  * counts, and row counts scale ×copies. The fixed dims (region,
  * nation) stay fixed — as they would at any SF.
  *
  * Two columns get a per-copy rewrite so DERIVED structure scales
  * linearly instead of exploding:
  *   - documents.text — copy 0 verbatim; copy c>0 permutes the word
  *     order by an md5(c:pos) sort key (in-row, deterministic), so
  *     cross-copy texts share no shingles and the near-dup candidate
  *     sets stay per-copy (10 verbatim copies would make EVERY doc a
  *     9-way near-dup and quadratically blow up the dedup keys);
  *   - embeddings.embedding — dimensions rotate left by c, preserving
  *     norms and all WITHIN-copy distances (cluster structure
  *     replicates) while decorrelating copies.
  *
  * Usage: runMain graft.StageSf1 [srcDir] [outDir]
  * (defaults /root/testdata/sf0.1 → target/sf1)
  */
object StageSf1 {
  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "target/sf1"
    val copies = sys.env.getOrElse("SPARK_GRAFT_SF1_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.Sessions.config(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** `copies` images of the table, id columns offset per copy. */
    def scaled(name: String, idCols: Seq[String])(
        mutate: (DataFrame, Int) => DataFrame = (df, _) => df): DataFrame = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until copies).map { c =>
        val shifted = idCols.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(c * Stride)))
        mutate(shifted, c)
      }.reduce(_ unionByName _)
    }

    def write(name: String, df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      System.err.println(s"[sf1] $name written")
    }

    // fixed dims pass through untouched
    Seq("region", "nation").foreach(n =>
      write(n, spark.read.parquet(s"$src/$n.parquet")))

    write("customer", scaled("customer", Seq("c_custkey"))())
    write("supplier", scaled("supplier", Seq("s_suppkey"))())
    write("part", scaled("part", Seq("p_partkey"))())
    write("orders", scaled("orders", Seq("o_orderkey", "o_custkey"))())
    write("lineitem", scaled("lineitem",
      Seq("l_orderkey", "l_partkey", "l_suppkey"))())
    // ts passes through in whatever physical type the source uses
    // (NANOS-as-long or micros) — every consumer derives ms through
    // Tables.msExpr either way
    write("events", scaled("events", Seq("event_id", "user_id"))())
    write("documents", scaled("documents", Seq("doc_id")) { (df, c) =>
      if (c == 0) df
      else df.withColumn("text", expr(
        s"array_join(transform(array_sort(transform(split(text, ' '), " +
          s"(w, i) -> struct(md5(concat('$c', ':', cast(i as string))) " +
          s"as k, w as w))), x -> x.w), ' ')"))
    })
    write("embeddings", scaled("embeddings", Seq("vec_id")) { (df, c) =>
      // rotate by c MOD dim: a copy index at or beyond the vector width
      // (copies > 64, the sf10 staging) would otherwise slice past the
      // array end and null the column
      val r = s"(pmod($c, size(embedding)))"
      if (c == 0) df
      else df.withColumn("embedding", expr(
        s"concat(slice(embedding, $r + 1, size(embedding) - $r), " +
          s"slice(embedding, 1, $r))"))
    })
    System.err.println(s"[sf1] done → $out (copies=$copies)")
    spark.stop()
  }
}
