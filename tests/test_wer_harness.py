"""QA accuracy harness (reference scripts/calculate_accuracy.py →
results ⋈ golden equi-join + WER UDF + aggregate)."""

import math

import pandas as pd
import pytest

from pii_redaction_pipeline_spark import core, datagen
from pii_redaction_pipeline_spark.functions.wer import (
    batch_wer,
    clean_human_transcript,
    wer_udf,
)
from pyspark.sql import functions as F


def make_human_ref(pdf: pd.DataFrame) -> pd.DataFrame:
    """FIXTURES §3: transcripts with timestamp/speaker/tag noise the
    cleaner must strip (reference scripts/calculate_accuracy.py:15-27)."""
    rows = []
    for i, row in enumerate(pdf.itertuples()):
        text = row.transcript
        noisy = f"[{i}.340] <Speaker_1> {text} <no-speech>"
        rows.append((row.clip_id, noisy))
    return pd.DataFrame(rows, columns=["clip_id", "human_text"])


def test_clean_human_transcript():
    assert clean_human_transcript(
        "[12.340] <Speaker_1> hello there <no-speech>") == "hello there"


def test_batch_wer_identical_after_cleaning(spark):
    pdf = datagen.clips_pandas(80, seed=9, with_audio=False)
    results = spark.createDataFrame(pdf[["clip_id", "transcript"]])
    golden = spark.createDataFrame(make_human_ref(pdf))
    golden = golden.withColumn(
        "human_text",
        F.regexp_replace(F.regexp_replace("human_text", r"\[[\d.]+\]", " "),
                         r"<[^>]*>", " "))
    agg = batch_wer(results, golden).collect()[0]
    # cleaned human text == ASR text modulo whitespace → WER 0
    assert agg["aggregate_wer"] == 0.0 or math.isnan(agg["aggregate_wer"])
    assert agg["num_samples"] == 80


def test_batch_wer_excludes_empty_reference_rows(spark):
    """Reference calculate_batch_wer (src/wer_calculator.py:193-197)
    excludes reference_words==0 rows from mean_wer: one empty-ref /
    non-empty-hyp row (wer=inf) must not poison the mean, and empty/empty
    rows must not bias it low. Matches core-computed expectation."""
    pairs = [
        ("c1", "the quick brown fox", "the quick brown fix"),   # wer 0.25
        ("c2", "", "ghost words here"),                          # inf, excluded
        ("c3", "", ""),                                          # 0/0, excluded
        ("c4", "a b c d", "a b c d"),                            # wer 0.0
    ]
    results = spark.createDataFrame(
        [(c, h) for c, _, h in pairs], ["clip_id", "transcript"])
    golden = spark.createDataFrame(
        [(c, r) for c, r, _ in pairs], ["clip_id", "human_text"])
    agg = batch_wer(results, golden).collect()[0]
    valid = [core.wer(r, h)["wer"] for _, r, h in pairs
             if core.wer(r, h)["reference_words"] > 0]
    assert math.isfinite(agg["mean_wer"])
    assert math.isclose(agg["mean_wer"], sum(valid) / len(valid))
    assert agg["num_samples"] == 4
    # all-empty references → aggregate_wer defaults to 0.0, not NaN/inf
    r2 = spark.createDataFrame([("x", "hyp words")], ["clip_id", "transcript"])
    g2 = spark.createDataFrame([("x", "")], ["clip_id", "human_text"])
    agg2 = batch_wer(r2, g2).collect()[0]
    assert agg2["aggregate_wer"] == 0.0
    assert agg2["mean_wer"] == 0.0


def test_wer_udf_matches_core(spark):
    pairs = [
        ("I visited Houston Texas on Monday", "I visited Huston Texas on Munday"),
        ("the quick brown fox", "the quick brown fox"),
        ("a b c d", "a b d"),
        ("", "something here"),
    ]
    df = spark.createDataFrame(pairs, ["ref", "hyp"])
    rows = df.withColumn("w", wer_udf("ref", "hyp")).select("ref", "hyp", "w.*").collect()
    for r in rows:
        exp = core.wer(r["ref"], r["hyp"])
        assert r["substitutions"] == exp["substitutions"]
        assert r["insertions"] == exp["insertions"]
        assert r["deletions"] == exp["deletions"]
        if math.isinf(exp["wer"]):
            assert math.isinf(r["wer"])
        else:
            assert math.isclose(r["wer"], exp["wer"], rel_tol=1e-12)


def test_wer_counts_batch_equals_core_wer_fuzz():
    """The batched numpy DP (the UDF kernel) must equal core.wer (the
    scalar oracle, itself reference-parity-pinned) row-for-row on a
    mutation corpus: same wer, same canonical S/I/D split (tie-break
    sub ≤ ins ≤ del), same edge handling (empty/whitespace/punct rows,
    m=0 inf convention)."""
    import random

    from pii_redaction_pipeline_spark import core
    from pii_redaction_pipeline_spark.functions.wer import wer_counts_batch

    random.seed(7)
    W = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
         "theta", "the", "a", "of"]

    def rand_text(lo, hi):
        return " ".join(random.choice(W)
                        for _ in range(random.randint(lo, hi)))

    refs, hyps = [], []
    for _ in range(1500):
        r = rand_text(0, 40)
        if random.random() < 0.7:  # mutated hypothesis (realistic WER)
            out = []
            for t in r.split():
                p = random.random()
                if p < 0.1:
                    continue
                out.append(random.choice(W) if p < 0.2 else t)
                if random.random() < 0.1:
                    out.append(random.choice(W))
            h = " ".join(out)
        else:
            h = rand_text(0, 40)
        refs.append(r)
        hyps.append(h)
    refs += ["Hello, WORLD! it's", "", "x", "  ", "a b c"]
    hyps += ["hello world its", "y", "", "", "a x c d"]

    batch = wer_counts_batch(refs, hyps)
    for i, (r, h) in enumerate(zip(refs, hyps)):
        want = core.wer(r, h)
        for k in want:
            got = batch[k][i]
            assert want[k] == got or (want[k] != want[k] and got != got), \
                (i, k, want[k], got, r, h)


def test_wer_counts_batch_long_doc_chunk_path():
    """A 1,500-word row exceeds the mixed-chunk cell budget and takes the
    single-row chunk path; counts must still equal core.wer. Also mixes
    in short rows so the size-sorted chunking scatter-back is exercised
    (results must land at their ORIGINAL indices)."""
    import random

    from pii_redaction_pipeline_spark import core
    from pii_redaction_pipeline_spark.functions.wer import wer_counts_batch

    random.seed(11)
    W = ["aa", "bb", "cc", "dd", "ee", "ff"]
    long_ref = " ".join(random.choice(W) for _ in range(1500))
    long_hyp = " ".join(
        random.choice(W) if random.random() < 0.1 else t
        for t in long_ref.split() if random.random() > 0.05)
    refs = ["aa bb", long_ref, "", "cc dd ee"]
    hyps = ["aa xx", long_hyp, "zz", "cc ee"]
    batch = wer_counts_batch(refs, hyps)
    for i, (r, h) in enumerate(zip(refs, hyps)):
        want = core.wer(r, h)
        for k in want:
            got = batch[k][i]
            assert want[k] == got or (want[k] != want[k] and got != got), \
                (i, k, want[k], got)
