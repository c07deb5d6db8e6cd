package graft

/** Laws for the integer power-iteration PCA (embedding_pca_top1):
  * crafted embedding tables with hand-computed eigenstructure through
  * the REAL query function.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def emb(vecs: Seq[Array[Float]]) =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
      .toDF("vec_id", "embedding", "label")

  test("an axis-aligned corpus converges to that axis exactly") {
    // all mass on e1: G = diag(3e12, 0, 0, 0) — the iteration fixes
    // v = (1e6, 0, 0, 0) after round 1 and λ_q = 3e12 · 1e6
    val dir = stageTables("embeddings" -> emb(Seq.fill(3)(
      Array(1f, 0f, 0f, 0f))))
    val got = run("embedding_pca_top1", dir).collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(1000000L, 0L, 0L, 0L))
    assert(got(0).getString(2) === "3000000000000000000")
  }

  test("the sign convention flips a negative-first-component direction") {
    // dominant direction ∝ (−0.5, 1): the fixed point is
    // (−5e5, 1e6, 0, 0), sign-fixed to (5e5, −1e6, 0, 0);
    // λ_q = max|G·v| = 2.5e18 (hand-computed for n=2)
    val dir = stageTables("embeddings" -> emb(Seq.fill(2)(
      Array(-0.5f, 1f, 0f, 0f))))
    val got = run("embedding_pca_top1", dir).collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(500000L, -1000000L, 0L, 0L))
    assert(got(0).getString(2) === "2500000000000000000")
  }

  test("power iteration separates a dominant from a minor axis") {
    // 5 vectors on e1, 1 on e2 → top direction is e1; the e2
    // component must renormalize to a small remnant, not survive
    val dir = stageTables("embeddings" -> emb(
      Seq.fill(5)(Array(1f, 0f, 0f, 0f)) :+ Array(0f, 1f, 0f, 0f)))
    val got = run("embedding_pca_top1", dir).collect()
    assert(got(0).getLong(1) === 1000000L)
    assert(math.abs(got(1).getLong(1)) < 100000L)
  }
}
