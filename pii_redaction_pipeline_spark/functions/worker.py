"""Per-worker runtime tuning for long-lived, reused Python UDF workers.

Round-7 finding: the headline pipeline's wall fluctuated 7 s → 17-42 s
across identical runs (1M clips, local[32]) with ZERO worker churn,
stable RSS, clean JVM canaries, and no failed tasks. The culprit is
CPython's generational GC inside the reused workers
(spark.python.worker.reuse=true): the UDF kernels allocate tens of
objects per row, so gen-2 collections fire every ~N allocations and
each one scans the ENTIRE worker heap — pyspark + pandas + numpy
imports plus the scrub memo caches — for hundreds of ms; when several
of 32 workers hit their gen-2 sweep inside the same run, that run's
wall inflates 2-6×. Measured A/B over 10 runs: untuned
[42.5, 8.3, 8.0, 10.4, 13.5, 8.1, 7.8, 7.7, 17.8, 24.3] vs tuned
[6.9, 6.6, 7.4, 7.3, 8.0, 8.8, 9.1, 8.1, 7.4, 7.9].

The fix is the standard long-lived-worker recipe (known publicly from
CPython's gc.freeze() docs and the Instagram engineering writeup that
motivated it): collect once, freeze everything allocated so far
(imports, lexicon tables, compiled regexes move to a permanent
generation the collector never scans again), and raise the gen-0
threshold so full sweeps become rare. Row-level objects are acyclic
(freed by refcounting, not the cycle collector), so cycle-collection
pressure stays near zero and memory does not grow unbounded — the only
cyclic garbage is occasional pandas/pyarrow internals, still collected,
just rarely.

Every batch-looping UDF kernel calls tune_gc() at entry; the module
global makes repeat calls free. Opt out with
PII_SPARK_NO_WORKER_GC_TUNE=1 (e.g. when hunting a real leak with gc
debugging).
"""

from __future__ import annotations

import os

_TUNED = False


def tune_gc() -> None:
    global _TUNED
    if _TUNED:
        return
    _TUNED = True  # checked before the env read: both paths are one-shot
    if os.environ.get("PII_SPARK_NO_WORKER_GC_TUNE") == "1":
        return
    import gc

    gc.collect()
    gc.freeze()
    gc.set_threshold(500_000, 100, 100)
