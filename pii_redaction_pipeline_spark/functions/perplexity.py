"""Char-bigram perplexity as a vectorized pandas UDF (KenLM-style score).

Two backends behind one UDF:
  - KenLM, when $PII_SPARK_PROD_BACKENDS=1 (explicit opt-in, same gate
    as functions/langid.py — keeps the correctness harness deterministic
    on hosts with ambient model env vars), the library is installed AND
    $KENLM_MODEL points at an .arpa/.bin n-gram model: loaded once per
    Python worker, scored per row with `model.perplexity` (KenLM's C++
    scorer — the production path on a real cluster).
  - the deterministic in-repo char-bigram table otherwise (this sandbox
    has no KenLM; the table is built once at import from
    core._build_ppl_table and shipped in the UDF closure). The batch
    kernel is numpy: chars → ids → table gather → segment means, no
    per-row Python string loops.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

from .. import core

_KENLM_MODEL = None  # per-worker memo


def _kenlm_model():
    global _KENLM_MODEL
    if os.environ.get("PII_SPARK_PROD_BACKENDS") != "1":
        from .langid import warn_gated_backend
        warn_gated_backend("KENLM_MODEL")
        return None  # explicit opt-in only — see module docstring
    if _KENLM_MODEL is not None:
        return _KENLM_MODEL if _KENLM_MODEL != "unavailable" else None
    path = os.environ.get("KENLM_MODEL", "")
    try:
        import kenlm  # not in this container; present on prod images
        if path and os.path.exists(path):
            _KENLM_MODEL = kenlm.Model(path)
            return _KENLM_MODEL
    except ImportError:
        pass
    _KENLM_MODEL = "unavailable"
    return None

_V = len(core._PPL_VOCAB)
_CHAR_TO_ID = np.full(128, _V, dtype=np.int32)  # OOV bucket = _V
for _i, _c in enumerate(core._PPL_VOCAB):
    _CHAR_TO_ID[ord(_c)] = _i

# (V+1)x(V+1) table with OOV row/col = uniform log prob
_TABLE = np.full((_V + 1, _V + 1), core._PPL_OOV, dtype=np.float64)
for (_a, _b), _lp in core._PPL_TABLE.items():
    _TABLE[core._PPL_VOCAB.index(_a), core._PPL_VOCAB.index(_b)] = _lp

# batch-kernel variants: one-op id mapping via take(mode='clip') — entry
# 128 is the OOV id, and any codepoint ≥ 128 clips onto it — and a flat
# table so the bigram gather is a single 1-D fancy index
_CHAR_TO_ID_EXT = np.concatenate(
    [_CHAR_TO_ID, np.array([_V], dtype=np.int32)])
_TABLE_FLAT = _TABLE.ravel()


def ppl_batch(texts: pd.Series) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.float64)
    for k, text in enumerate(texts):
        out[k] = _ppl_one(text)
    return out


def _ppl_one(text) -> float:
    if text is None:
        return float(_V)
    s = core._WS_COLLAPSE_RE.sub(" ", str(text).lower())  # same regex as core
    if len(s) < 2:
        return float(_V)
    # code points (not utf-8 bytes) so non-ASCII chars are single OOV
    # entries exactly like core's per-char dict miss. take(mode='clip')
    # + flat-table gather produce the same ids/log-probs as the
    # where/minimum + 2-D gather form with ~half the temporaries
    # (round 7: 40 → 25 µs/row; values bit-identical, mean over the
    # same fresh array)
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    ids = _CHAR_TO_ID_EXT.take(codes, mode="clip")
    lp = _TABLE_FLAT[ids[:-1].astype(np.int64) * (_V + 1) + ids[1:]]
    return float(np.exp(-lp.mean()))


@pandas_udf(T.DoubleType())
def ppl_udf(transcript: pd.Series) -> pd.Series:
    from .worker import tune_gc
    tune_gc()
    model = _kenlm_model()
    if model is not None:
        return pd.Series([
            float(model.perplexity(" ".join((t or "").split())))
            for t in transcript])
    return pd.Series(ppl_batch(transcript))


def with_ppl(df, text_col: str = "transcript"):
    return df.withColumn("ppl", ppl_udf(F.col(text_col)))
