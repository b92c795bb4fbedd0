"""Vectorized language-ID UDF (north rule: "fastText langid ... run as
vectorized pandas/Arrow UDFs"). The deterministic in-repo stand-in is
core.langid's stopword-hit scorer; the fastText swap point is this one
function body (load the model once per worker in the closure, batch
predict).

Catalyst fuses this into the same ArrowEvalPython stage as the scrub and
perplexity UDFs — zero extra Python round trips (plan-asserted in
tests/test_plan_shapes.py).
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import core

LANGID_STRUCT = T.StructType([
    T.StructField("lang", T.StringType()),
    T.StructField("lang_conf", T.DoubleType()),
])


@F.pandas_udf(LANGID_STRUCT)
def langid_udf(text: pd.Series) -> pd.DataFrame:
    out = {"lang": [], "lang_conf": []}
    for t in text:
        lang, conf = core.langid(t or "")
        out["lang"].append(lang)
        out["lang_conf"].append(conf)
    return pd.DataFrame(out)
