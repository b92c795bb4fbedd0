"""Similarity-search semantics the SQL oracle can't pin: LSH recall on
TRUE near-duplicates (the synthetic embeddings table has none — max
pairwise cosine ≈ 0.5), precision vs brute force, and the per-batch
partial top-k distributivity of the exact ANN kernel."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pii_redaction_pipeline_spark.functions.similarity import (
    spark_cosine_topk,
    spark_neardup_bruteforce,
    spark_neardup_pairs,
)

DIM = 64
N_BASE = 120
N_DUPS = 40


@pytest.fixture(scope="module")
def planted(spark):
    """Deterministic embeddings with planted near-duplicates: vector
    N_BASE+i is base vector i plus small noise (cosine > 0.99)."""
    rng = np.random.default_rng(4242)
    base = rng.normal(size=(N_BASE, DIM))
    noise = 0.02 * rng.normal(size=(N_DUPS, DIM))
    dups = base[:N_DUPS] + noise
    vecs = np.vstack([base, dups]).astype(np.float32)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_neardup_lsh_recall_on_true_dups(planted):
    """Planted near-identical pairs agree on leading-dim signs with
    probability ≈ 1 per hash table → LSH recall ≥ 0.95; every emitted
    pair is exact-verified, so precision vs brute force is 1.0."""
    lsh = {(r.id_a, r.id_b)
           for r in spark_neardup_pairs(planted, threshold=0.9).collect()}
    bf = {(r.id_a, r.id_b)
          for r in spark_neardup_bruteforce(
              planted, limit_ids=10**9, threshold=0.9).collect()}
    planted_pairs = {(i, N_BASE + i) for i in range(N_DUPS)}
    assert planted_pairs <= bf                   # the dups really are dups
    assert lsh <= bf                             # precision 1.0 (verified)
    assert len(lsh & bf) / len(bf) >= 0.95       # recall on true near-dups


def test_neardup_plan_has_no_cartesian(planted):
    plan = spark_neardup_pairs(planted)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_topk_partial_topk_is_exact(planted):
    """The mapInPandas kernel keeps only per-batch top-k; with many small
    input partitions (many batches) the global result must still equal
    the single-partition answer — top-k is distributive."""
    one = {(r.q_id, r.n_id, r.rank)
           for r in spark_cosine_topk(planted.coalesce(1), k=5).collect()}
    many = {(r.q_id, r.n_id, r.rank)
            for r in spark_cosine_topk(planted.repartition(16), k=5).collect()}
    assert one == many
    assert len(one) == 8 * 5
