package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, OSql, Q, Tables}

/** LLM-training-data pipeline operators (mandated surface beyond the
  * reference: dedup, text analysis, similarity search, multimodal).
  *
  * Scale notes:
  *  - dedup_exact hashes then groups — the shuffle carries (hash, id),
  *    never the document text;
  *  - tokenize/wordcount is explode → partial agg: the map-side combine
  *    collapses each partition's token counts before the shuffle;
  *  - sim_cosine_topk broadcasts the probe vector(s) and computes the
  *    dot product as a codegen'd higher-order fold over the embedding
  *    array (no explode → 64× row blowup, no shuffle before top-k).
  */
object LlmPipeline {
  import Det._

  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  private val dedupExact = Q(
    "dedup_exact",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .groupBy(md5($"text").as("h"))
        .agg(count(lit(1)).as("cnt"), min($"doc_id").as("keeper"))
        .orderBy("h")
        .limit(200)
    },
    Some("SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS keeper " +
      "FROM documents GROUP BY 1 ORDER BY h LIMIT 200"))

  private val tokenizeWordcount = Q(
    "text_tokenize_wordcount",
    (s, d) => {
      import s.implicits._
      val counts = t(s, d, "documents")
        .select($"lang", explode(split($"text", " ")).as("token"))
        .groupBy("lang", "token")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"token".asc)
      counts.withColumn("rn", row_number().over(w))
        .filter($"rn" <= 20)
        .select($"lang", $"rn".cast("long").as("rn"), $"token", $"cnt")
        .orderBy("lang", "rn")
    },
    Some("WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents), " +
      "c AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY 1, 2), " +
      "r AS (SELECT lang, token, cnt, row_number() OVER " +
      "(PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rn FROM c) " +
      "SELECT lang, CAST(rn AS BIGINT) AS rn, token, cnt FROM r WHERE rn <= 20 " +
      "ORDER BY lang, rn"))

  private val textStats = Q(
    "text_stats",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          dround(avg($"n_chars".cast("double")), 4).as("avg_chars"),
          dround(avg(size(split($"text", " ")).cast("double")), 4).as("avg_tokens"),
          max($"n_chars").as("max_chars"))
        .orderBy("lang", "source")
    },
    Some("SELECT lang, source, count(*) AS n_docs, " +
      OSql.sround("AVG(CAST(n_chars AS DOUBLE))", 4) + " AS avg_chars, " +
      OSql.sround("AVG(CAST(len(string_split(text, ' ')) AS DOUBLE))", 4) + " AS avg_tokens, " +
      "max(n_chars) AS max_chars FROM documents GROUP BY 1, 2 ORDER BY 1, 2"))

  /** Brute-force cosine top-k against probe vec_id=0. Embeddings are
    * L2-normalized (FIXTURES.md) so the dot product IS cosine. The probe
    * is a 1-row broadcast; the dot product is zip_with + aggregate —
    * array-order folds, identical in both engines, rounded to 6dp
    * before the ORDER BY so the top-20 cut is on identical keys.
    */
  private val simCosineTopk = Q(
    "sim_cosine_topk",
    (s, d) => {
      import s.implicits._
      val emb = t(s, d, "embeddings")
      val probe = emb.filter($"vec_id" === 0).select($"embedding".as("probe"))
      emb.crossJoin(broadcast(probe))
        .select($"vec_id",
          dround(aggregate(
            zip_with($"embedding", $"probe", (a, b) => a.cast("double") * b.cast("double")),
            lit(0.0), (acc, x) => acc + x), 6).as("sim"))
        .orderBy($"sim".desc, $"vec_id".asc)
        .limit(20)
    },
    Some("WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0), " +
      "ex AS (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i " +
      "FROM embeddings), " +
      "px AS (SELECT unnest(p) AS y, generate_subscripts(p, 1) AS i FROM probe) " +
      "SELECT vec_id, " + OSql.sround("SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))", 6) +
      " AS sim FROM ex JOIN px USING (i) GROUP BY vec_id " +
      "ORDER BY sim DESC, vec_id ASC LIMIT 20"))

  /** Multimodal row: text metadata ⋈ vector modality on the shared id. */
  private val multimodalJoin = Q(
    "multimodal_join",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .join(t(s, d, "embeddings"), $"doc_id" === $"vec_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          dround(avg(element_at($"embedding", 1).cast("double")), 6).as("avg_first"))
        .orderBy("lang")
    },
    Some("SELECT lang, count(*) AS n, " +
      OSql.sround("AVG(CAST(embedding[1] AS DOUBLE))", 6) + " AS avg_first " +
      "FROM documents JOIN embeddings ON doc_id = vec_id GROUP BY 1 ORDER BY 1"))

  val qs: Seq[Q] = Seq(
    dedupExact, tokenizeWordcount, textStats, simCosineTopk, multimodalJoin)
}
