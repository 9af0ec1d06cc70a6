package graft.operators

import graft.QueryGroup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, dim 64).
  * Two paths, per the training-pipeline brief:
  *  - brute-force cosine top-k — the exactness baseline (O(Q·N), fine
  *    when the query set is small and broadcast);
  *  - LSH-bucketed ANN (random hyperplanes) — the scale path: signatures
  *    are map-side, candidate generation shuffles only bucket keys, so it
  *    survives N = billions where brute force can't.
  *
  * All vector math is codegen'd builtin lambdas (zip_with/aggregate) in
  * double precision — no UDFs.
  */
object SimilarityOps extends QueryGroup {

  /** dot(a, b) in double precision. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  private def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def defs = Seq(
    // ── brute-force cosine top-k (k=5) for a 10-vector query set ──
    q("sim_cosine_topk",
      """WITH qs AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q_id, vec_id AS n_id,
        |    list_cosine_similarity(q_emb, embedding) AS sim
        |  FROM qs CROSS JOIN embeddings
        |  WHERE vec_id <> q_id),
        |ranked AS (
        |  SELECT q_id, n_id, sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
        |  FROM scored)
        |SELECT q_id, rk, n_id, round(sim, 4) AS sim
        |FROM ranked WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin) { (s, _) =>
      val emb = s.table("embeddings")
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val scored = broadcast(qs).crossJoin(emb)
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosine(col("q_emb"), col("embedding")).as("sim"))
      val w = Window.partitionBy("q_id").orderBy(desc("sim"), col("n_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("n_id"), round(col("sim"), 4).as("sim"))
        .orderBy("q_id", "rk")
    },

    // ── pairwise cosine over a restricted id band (exact, oracle-able) ──
    q("sim_pairwise_band",
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < b.vec_id AND b.vec_id - a.vec_id <= 5
        |WHERE a.vec_id < 40
        |ORDER BY id_a, id_b""".stripMargin) { (s, _) =>
      val a = s.table("embeddings").select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
        .filter(col("id_a") < 40)
      val b = s.table("embeddings").select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
      a.join(b, col("id_a") < col("id_b") && col("id_b") - col("id_a") <= 5)
        .select(col("id_a"), col("id_b"), round(cosine(col("emb_a"), col("emb_b")), 4).as("sim"))
        .orderBy("id_a", "id_b")
    },

    // ── LSH-bucketed ANN: 16 random-hyperplane sign bits → bucket ──
    // Hyperplane j's component for dimension d is a deterministic ±1 from
    // xxhash64(j, d) — reproducible across runs/executors, no driver state.
    // Engine-specific hashing → no SQL oracle; SimilaritySpec measures
    // recall against sim_cosine_topk's exact answers.
    qNoOracle("sim_lsh_ann") { (s, _) =>
      s.sql("""WITH sig AS (
              |  SELECT vec_id, embedding,
              |    aggregate(sequence(0, 15), 0L, (acc, j) -> acc + IF(
              |      aggregate(
              |        zip_with(embedding, sequence(0, size(embedding) - 1),
              |          (x, d) -> CAST(x AS DOUBLE) * IF(pmod(xxhash64(j, d), 2) = 0, 1.0D, -1.0D)),
              |        0.0D, (a, v) -> a + v) > 0,
              |      shiftleft(1L, j), 0L)) AS bucket
              |  FROM embeddings),
              |qs AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM sig WHERE vec_id < 10),
              |cand AS (
              |  SELECT q.q_id, s.vec_id AS n_id, q.q_emb, s.embedding
              |  FROM qs q JOIN sig s ON q.bucket = s.bucket AND s.vec_id <> q.q_id),
              |scored AS (
              |  SELECT q_id, n_id,
              |    aggregate(zip_with(q_emb, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (a, v) -> a + v)
              |    / (sqrt(aggregate(q_emb, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
              |       * sqrt(aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS sim
              |  FROM cand),
              |ranked AS (
              |  SELECT q_id, n_id, sim,
              |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rk
              |  FROM scored)
              |SELECT q_id, rk, n_id, round(sim, 4) AS sim
              |FROM ranked WHERE rk <= 5
              |ORDER BY q_id, rk""".stripMargin)
    },

    // ── vector stats: norms and centroid distance per label ──
    q("sim_vector_stats",
      """WITH n AS (
        |  SELECT label, vec_id,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  round(avg(nrm), 4) AS avg_norm,
        |  round(min(nrm), 4) AS min_norm,
        |  round(max(nrm), 4) AS max_norm
        |FROM n GROUP BY label
        |ORDER BY label""".stripMargin) { (s, _) =>
      s.table("embeddings")
        .select(col("label"), norm(col("embedding")).as("nrm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg("nrm"), 4).as("avg_norm"),
          round(min("nrm"), 4).as("min_norm"),
          round(max("nrm"), 4).as("max_norm"))
        .orderBy("label")
    },
  )
}
