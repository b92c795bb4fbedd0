"""Salt-advice automation (round-5 verdict item 5): turn SCALE.md's
runbook sentence — "flip `salt_partitions` on when per-bucket elapsed
variance far exceeds per-bucket byte variance" — into a measured,
testable decision instead of operator folklore.

Why variance-of-cost vs variance-of-bytes: Spark's scan splits are
byte-balanced, so any skew that is PROPORTIONAL to bytes is already
handled (and salting it is pure overhead — the full-table exchange
taxes the bigger cluster by its remote-fetch fraction 1−1/W; measured
0.68→0.52 scaling in BENCH/BASELINE.md). The skew that DOES kill
scaling is cost decoupled from bytes — a hot-language model path, rows
with memo-defeating unique vocabulary (85 ms/row vs 0.05 ms/row at ~2×
bytes in skew_fixture.py) — which byte-balanced splits cannot see. The
squared coefficient of variation (CV² = var/mean²) is the
scale-free statistic for "how unequal are the partitions": comparing
CV²(cost) against CV²(bytes) asks exactly "is there cost skew beyond
what byte balancing already absorbs?".

Two inputs are supported:
  - `partition_cost_profile`: a SAMPLED probe pass over the live input
    that times core.scrub_row per row inside an Arrow-batched UDF and
    aggregates per SCAN PARTITION (spark_partition_id — the actual
    straggler unit: one scan split = one task). Production use: run on
    ~0.1-1% of the corpus before launching a 10^12-clip job.
  - `ResumableRun.lineage()` rows (one bucket per run invocation), or
    any (bucket, elapsed, bytes-proxy) frame — `salt_advice` is
    column-name-parameterized.

Sampling caveat: the probe measures first-visit cost; the in-repo fuzzy
kernel memoizes per Python worker, so a probe over rows with REPEATED
vocabulary under-reports steady-state cost the same way the real run
under-pays it — the relative per-partition comparison is unaffected.
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# cost CV² must exceed byte CV² by this factor before salting is advised
RATIO_THRESHOLD = 4.0
# ... and be at least this large in absolute terms (a perfectly uniform
# corpus has CV² ≈ 0 for both; tiny ratios of tiny numbers are noise)
MIN_COST_CV2 = 0.25
SALT_CORE_MULTIPLE = 8  # recommendation: salt_partitions = 8 × cores


def _row_cost_probe_udf(with_fuzzy: bool = True):
    """Per-row scrub wall time in microseconds (perf_counter_ns around
    core.scrub_row — the same kernel the pipeline's pandas UDF runs, so
    the probe measures the true hot path, not a proxy)."""
    from .. import core

    @pandas_udf("long")
    def probe(transcript: pd.Series) -> pd.Series:
        out = []
        for text in transcript:
            t0 = time.perf_counter_ns()
            core.scrub_row(text, with_fuzzy)
            out.append((time.perf_counter_ns() - t0) // 1000)
        return pd.Series(out, dtype="int64")
    return probe


def partition_cost_profile(clips: DataFrame,
                           sample_fraction: float | None = None,
                           text_col: str = "transcript",
                           with_fuzzy: bool = True) -> DataFrame:
    """(partition_id, n_rows, n_bytes, elapsed_ms) per SCAN partition.

    One narrow pass: sample → per-row probe UDF → tiny hash aggregate
    keyed on spark_partition_id (map-side combine; output rows = number
    of scan splits — metadata-scale). `n_bytes` counts the columns a
    task actually moves: the text plus the audio payload when present.
    """
    if sample_fraction is not None:
        clips = clips.sample(fraction=sample_fraction, seed=42)
    probe = _row_cost_probe_udf(with_fuzzy)
    byte_cols = [F.coalesce(F.octet_length(F.col(text_col)), F.lit(0))]
    if "bytes" in clips.columns:
        byte_cols.append(F.coalesce(F.octet_length(F.col("bytes")), F.lit(0)))
    sized = clips.select(
        F.spark_partition_id().alias("partition_id"),
        sum(byte_cols[1:], byte_cols[0]).alias("_row_bytes"),
        probe(F.col(text_col)).alias("_proc_us"))
    return (sized.groupBy("partition_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.sum("_row_bytes").cast("bigint").alias("n_bytes"),
                 (F.sum("_proc_us") / 1000).cast("bigint")
                 .alias("elapsed_ms")))


def salt_advice(per_bucket: DataFrame, cores: int,
                elapsed_col: str = "elapsed_ms",
                bytes_col: str = "n_bytes",
                ratio_threshold: float = RATIO_THRESHOLD,
                min_cost_cv2: float = MIN_COST_CV2) -> dict:
    """The runbook rule as a function. Accepts any per-bucket frame —
    `partition_cost_profile` output, or `ResumableRun.lineage()` with
    `bytes_col="n_rows"` as the balance proxy when runs are one bucket
    each. Returns a dict (all floats rounded for log/JSON stability):

      salt_recommended      cost skew beyond byte balancing detected
      salt_partitions       the 8×cores recommendation (None if not)
      cost_cv2 / bytes_cv2  the two variance statistics
      ratio                 cost_cv2 / max(bytes_cv2, 1e-9)
      n_buckets             rows observed

    The caller decides what to do with it; job.py --advise-salt logs it
    and PROCEEDS (advice, not a gate).
    """
    stats = per_bucket.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(elapsed_col).alias("e_mean"),
        F.var_pop(elapsed_col).alias("e_var"),
        F.avg(bytes_col).alias("b_mean"),
        F.var_pop(bytes_col).alias("b_var")).collect()[0]
    n = stats["n"] or 0
    if n < 2 or not stats["e_mean"]:
        # two distinct no-signal cases (round-5 advice): too few buckets
        # vs a probe so tiny every per-bucket elapsed rounded to 0 ms —
        # the remedies differ (more buckets vs a bigger sample)
        note = ("fewer than 2 buckets observed — no skew signal"
                if n < 2 else
                "all per-bucket elapsed_ms are 0 — probe too small to "
                "carry a cost signal; raise the sample fraction")
        return {"salt_recommended": False, "salt_partitions": None,
                "cost_cv2": 0.0, "bytes_cv2": 0.0, "ratio": 0.0,
                "n_buckets": int(n), "note": note}
    cost_cv2 = (stats["e_var"] or 0.0) / (stats["e_mean"] ** 2)
    bytes_cv2 = ((stats["b_var"] or 0.0) / (stats["b_mean"] ** 2)
                 if stats["b_mean"] else 0.0)
    ratio = cost_cv2 / max(bytes_cv2, 1e-9)
    recommended = cost_cv2 >= min_cost_cv2 and ratio >= ratio_threshold
    return {
        "salt_recommended": bool(recommended),
        "salt_partitions": SALT_CORE_MULTIPLE * cores if recommended else None,
        "cost_cv2": round(cost_cv2, 4),
        "bytes_cv2": round(bytes_cv2, 4),
        "ratio": round(min(ratio, 1e9), 2),
        "n_buckets": int(n),
    }


def advise_salt(clips: DataFrame, cores: int,
                sample_fraction: float | None = None,
                text_col: str = "transcript",
                with_fuzzy: bool = True) -> dict:
    """One-call form: probe the input's scan partitions and apply the
    rule. This is what `job.py --advise-salt` runs before the pipeline."""
    profile = partition_cost_profile(clips, sample_fraction, text_col,
                                     with_fuzzy)
    return salt_advice(profile, cores)


def cost_balanced_rewrite(clips: DataFrame, out_path: str,
                          n_files: int | None = None,
                          cores: int | None = None,
                          files_per_core: int = 16) -> int:
    """The LAYOUT remedy the salt measurements point at
    (BENCH/SALT_VALIDATION.md round 5): a ONE-TIME offline rewrite that
    hash-spreads rows uniformly across many small files, so every
    future scan split carries the same cost MIXTURE and the job runs
    shuffle-free at the ≥0.8 scaling path — instead of paying the
    salted exchange (and its 1−1/W remote-fetch asymmetry) on EVERY
    run.

    Why a plain hash repartition balances COST, not just bytes: after a
    uniform shuffle on the row key every output file holds an unbiased
    sample of the corpus, so per-file cost ≈ total_cost / n_files
    regardless of how cost was distributed in the input (the hot rows
    that were 4 contiguous files become ~n_hot/n_files rows in EVERY
    file). The same property that makes the runtime salt work — applied
    once, amortized over every subsequent run.

    `n_files` defaults to files_per_core × cores — fine enough that a
    cluster 4× bigger still gets ≥4 waves of splits (the uniform-corpus
    512-file methodology in BENCH/BASELINE.md). Repartition is on the
    key COLUMN (hash(col) once inside the exchange) — repartitioning on
    a precomputed pmod(hash(key), n) expression re-hashes the n bucket
    values and collides them into fewer partitions (measured round 2:
    16 salts → 10 non-empty partitions).

    Returns the file count written. At 10^12 rows this is one
    bandwidth-bound shuffle + write per table lifetime; pair with the
    advisor — `salt_advice` on a profile of the REWRITTEN table should
    come back not-recommended (test-pinned).
    """
    if n_files is None:
        if cores is None:
            cores = clips.sparkSession.sparkContext.defaultParallelism
        n_files = files_per_core * max(cores, 1)
    key = "clip_id" if "clip_id" in clips.columns else clips.columns[0]
    (clips.repartition(n_files, F.col(key))
     .write.mode("overwrite").parquet(out_path))
    return n_files
