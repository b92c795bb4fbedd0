"""Embedding similarity search operators (north-star first-class ops).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant (bucket on sign pattern of a few random projections — here
md5-free deterministic hyperplanes from the embedding itself would not be
an LSH, so we reuse the minhash-style banding idea over quantized
coordinates) is the scale path: candidates shuffle on bucket id instead
of a full cross join.

Dot products are computed in double on both engines (Spark: sequential
aggregate fold; DuckDB: list_dot_product) and rounded before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        "CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
_NORM = ("sqrt(aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * "
         "CAST(v AS DOUBLE)))")


def cosine_expr(a: str, b: str) -> F.Column:
    dot = _DOT.format(a=a, b=b)
    na = _NORM.format(a=a)
    nb = _NORM.format(a=b)
    return F.expr(f"({dot}) / (({na}) * ({nb}))")


def spark_cosine_topk(emb: DataFrame, n_probes: int = 8, k: int = 5) -> DataFrame:
    """Exact top-k neighbors for the probe set. Probes are broadcast —
    the fact side never shuffles; ranking is a per-probe window."""
    probes = (emb.where(F.col("vec_id") < n_probes)
              .select(F.col("vec_id").alias("q_id"),
                      F.col("embedding").alias("q_emb")))
    cand = emb.select(F.col("vec_id").alias("n_id"),
                      F.col("embedding").alias("n_emb"))
    j = (cand.join(F.broadcast(probes))
         .where(F.col("n_id") != F.col("q_id"))
         .withColumn("sim", F.round(cosine_expr("q_emb", "n_emb"), 6)))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (j.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "sim", F.col("rank").cast("bigint").alias("rank")))


def duck_cosine_topk_sql(n_probes: int = 8, k: int = 5) -> str:
    return f"""
WITH probes AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
  FROM embeddings WHERE vec_id < {n_probes}
), cand AS (
  SELECT vec_id AS n_id, embedding::DOUBLE[] AS n_emb FROM embeddings
), scored AS (
  SELECT q_id, n_id,
         round(list_dot_product(q_emb, n_emb) /
               (sqrt(list_dot_product(q_emb, q_emb)) *
                sqrt(list_dot_product(n_emb, n_emb))), 6) AS sim
  FROM cand, probes WHERE n_id <> q_id
), ranked AS (
  SELECT q_id, n_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC)
           AS rank
  FROM scored
)
SELECT q_id, n_id, sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


N_IVF_BITS = 4  # 16 coarse buckets from sign bits of the leading dims


def _spark_bucket_expr(col: str) -> str:
    return " + ".join(
        f"(CASE WHEN element_at({col}, {k + 1}) > 0 THEN {2 ** k} ELSE 0 END)"
        for k in range(N_IVF_BITS))


def spark_cosine_topk_ivf(emb: DataFrame, n_probes: int = 8,
                          k: int = 3) -> DataFrame:
    """IVF-flavored ANN: coarse-quantize vectors into sign-pattern buckets
    (the inverted-file cell), search only the probe's own bucket. At
    cluster scale this turns the cross join into an equi-join on
    bucket id — the candidate set shrinks ~|buckets|×, trading recall
    for a shuffle-joinable plan. Exactness within the bucket."""
    bucket = F.expr(_spark_bucket_expr("embedding")).cast("int")
    base = emb.withColumn("_b", bucket)
    probes = (base.where(F.col("vec_id") < n_probes)
              .select(F.col("vec_id").alias("q_id"),
                      F.col("embedding").alias("q_emb"),
                      F.col("_b").alias("qb")))
    cand = base.select(F.col("vec_id").alias("n_id"),
                       F.col("embedding").alias("n_emb"),
                       F.col("_b").alias("nb"))
    j = (cand.join(F.broadcast(probes), F.col("nb") == F.col("qb"))
         .where(F.col("n_id") != F.col("q_id"))
         .withColumn("sim", F.round(cosine_expr("q_emb", "n_emb"), 6)))
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (j.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "sim",
                    F.col("rank").cast("bigint").alias("rank")))


def duck_cosine_topk_ivf_sql(n_probes: int = 8, k: int = 3) -> str:
    bucket = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2 ** i} ELSE 0 END)"
        for i in range(N_IVF_BITS))
    return f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb, ({bucket}) AS b FROM embeddings
), probes AS (
  SELECT vec_id AS q_id, emb AS q_emb, b AS qb FROM base WHERE vec_id < {n_probes}
), scored AS (
  SELECT q_id, vec_id AS n_id,
         round(list_dot_product(q_emb, emb) /
               (sqrt(list_dot_product(q_emb, q_emb)) *
                sqrt(list_dot_product(emb, emb))), 6) AS sim
  FROM base JOIN probes ON base.b = probes.qb
  WHERE vec_id <> q_id
), ranked AS (
  SELECT q_id, n_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
  FROM scored
)
SELECT q_id, n_id, sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def spark_neardup_pairs(emb: DataFrame, limit_ids: int = 300,
                        threshold: float = 0.92) -> DataFrame:
    """Embedding-cosine near-dup pairs within a capped id range (the
    brute-force verifier; at scale the LSH bucket join prunes candidates
    first)."""
    a = (emb.where(F.col("vec_id") < limit_ids)
         .select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a")))
    b = (emb.where(F.col("vec_id") < limit_ids)
         .select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b")))
    j = (a.join(b).where(F.col("id_a") < F.col("id_b"))
         .withColumn("sim", F.round(cosine_expr("e_a", "e_b"), 6)))
    return j.where(F.col("sim") >= threshold).select("id_a", "id_b", "sim")


def duck_neardup_pairs_sql(limit_ids: int = 300, threshold: float = 0.92) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
  WHERE vec_id < {limit_ids}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.emb, b.emb) /
             (sqrt(list_dot_product(a.emb, a.emb)) *
              sqrt(list_dot_product(b.emb, b.emb))), 6) AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) /
      (sqrt(list_dot_product(a.emb, a.emb)) *
       sqrt(list_dot_product(b.emb, b.emb))) >= {threshold}
"""
