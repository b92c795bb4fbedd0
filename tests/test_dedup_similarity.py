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


def test_neardup_clusters_transitive(spark):
    """A~B and B~C near-dup pairs (A and C NOT similar enough directly)
    must land in ONE cluster labeled min(doc_id) — the propagation has to
    cross the missing edge transitively."""
    from pii_redaction_pipeline_spark.functions.dedup import (
        spark_jaccard_pairs,
        spark_neardup_clusters,
    )

    # sliding 18-word windows, stride 3: J(A,B)=J(B,C)=0.684 >= 0.5,
    # J(A,C)=0.455 < 0.5, and both chain pairs share an LSH band under
    # the (deterministic) md5 scheme — verified offline
    W = [f"w{i:02d}" for i in range(40)]
    texts = [
        (10, " ".join(W[0:18])),    # A
        (11, " ".join(W[3:21])),    # B
        (12, " ".join(W[6:24])),    # C
        (50, "totally different content here nothing shared at all ok"),
        (51, "totally different content here nothing shared at all ok"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    pairs = {(r.doc_a, r.doc_b)
             for r in spark_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (10, 11) in pairs and (11, 12) in pairs
    assert (10, 12) not in pairs                      # the transitive gap
    clusters = {r.doc_id: r.cluster_id
                for r in spark_neardup_clusters(docs, threshold=0.5).collect()}
    assert clusters[10] == clusters[11] == clusters[12] == 10
    assert clusters[50] == clusters[51] == 50


def test_ivf_multiprobe_recall_dominates_single_probe(planted):
    """Multi-probe (own bucket + Hamming-1 neighbors) must recall at
    least as much of the exact top-k as single-probe, per probe."""
    from pii_redaction_pipeline_spark.functions.similarity import (
        spark_cosine_topk_ivf,
        spark_cosine_topk_ivf_multiprobe,
    )

    exact = {(r.q_id, r.n_id)
             for r in spark_cosine_topk(planted, k=3).collect()}
    single = {(r.q_id, r.n_id)
              for r in spark_cosine_topk_ivf(planted, k=3).collect()}
    multi = {(r.q_id, r.n_id)
             for r in spark_cosine_topk_ivf_multiprobe(planted, k=3).collect()}
    assert len(multi & exact) >= len(single & exact)
    assert len(multi) >= len(single)


def test_exact_topk_empty_probe_set(planted):
    """No vectors under the probe-id cutoff → empty result, not a crash."""
    out = spark_cosine_topk(planted.where("vec_id >= 100"), n_probes=8).collect()
    assert out == []
