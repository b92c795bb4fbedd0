"""WER operator (reference src/wer_calculator.py) as a pandas UDF.

Used by the QA harness: results ⋈ golden on clip_id (plain equi-join —
reference scripts/calculate_accuracy.py:46-58 stem pairing) then this UDF,
then built-in aggregates for the batch WER totals
(src/wer_calculator.py:164-204).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from .. import core
from ..schema import WER_STRUCT

# Human-transcript cleanup (reference scripts/calculate_accuracy.py:15-27):
# strip [12.34] timestamps, <Speaker_1>/<tags>, collapse whitespace.
_TS_RE = re.compile(r"\[[\d.]+\]")
_TAG_RE = re.compile(r"<[^>]*>")


def clean_human_transcript(text: str) -> str:
    text = _TS_RE.sub(" ", text)
    text = _TAG_RE.sub(" ", text)
    return re.sub(r"\s+", " ", text).strip()


@pandas_udf(WER_STRUCT)
def wer_udf(reference: pd.Series, hypothesis: pd.Series) -> pd.DataFrame:
    out = {f.name: [] for f in WER_STRUCT.fields}
    for ref, hyp in zip(reference, hypothesis):
        r = core.wer(ref or "", hyp or "")
        for k in out:
            out[k].append(r[k])
    return pd.DataFrame(out)


def clean_human_udf():
    @pandas_udf(T.StringType())
    def _clean(text: pd.Series) -> pd.Series:
        return text.fillna("").map(clean_human_transcript)
    return _clean


def batch_wer(results_df, golden_df, hyp_col: str = "transcript",
              ref_col: str = "human_text"):
    """results ⋈ golden → per-row WER → aggregate totals. Aggregate WER =
    sum(S+I+D)/sum(ref_words), 0.0 when no reference words
    (src/wer_calculator.py:186-191). mean_wer averages only rows with
    reference_words > 0 (src/wer_calculator.py:193-197) — an empty
    reference yields wer=inf (non-empty hyp) or 0.0 (empty hyp), and the
    reference excludes both from the mean; 0.0 when none qualify."""
    joined = results_df.join(golden_df, "clip_id")
    joined = joined.withColumn("_wer", wer_udf(F.col(ref_col), F.col(hyp_col)))
    total_errs = (F.sum("_wer.substitutions") + F.sum("_wer.insertions")
                  + F.sum("_wer.deletions")).cast("double")
    total_ref = F.sum("_wer.reference_words")
    return joined.agg(
        F.when(total_ref > 0, total_errs / total_ref)
        .otherwise(F.lit(0.0)).alias("aggregate_wer"),
        F.coalesce(
            F.avg(F.when(F.col("_wer.reference_words") > 0, F.col("_wer.wer"))),
            F.lit(0.0)).alias("mean_wer"),
        F.sum("_wer.substitutions").alias("total_substitutions"),
        F.sum("_wer.insertions").alias("total_insertions"),
        F.sum("_wer.deletions").alias("total_deletions"),
        F.sum("_wer.reference_words").alias("total_reference_words"),
        F.count(F.lit(1)).alias("num_samples"),
    )
