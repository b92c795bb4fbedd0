"""Round-7 optimization harness: per-query noop-sink isolation + plan
capture (guide §1.4). NOT the frozen driver bench (bench.py) — this file
exists so optimization work can time individual registry queries at any
scale factor and dump `.explain("formatted")` into plans/r07/ without
touching the measured artifact.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --queries embedding_neardup
  python bench_extra.py --sf /root/testdata/sf1.0 --plans plans/r07 \
      --suffix before --queries all --runs 2

Prints one JSON line {"sf":..., "queries": {name: [walls...]}} and, with
--plans, writes plans/<dir>/<query>_<suffix>.txt per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--queries", default="all",
                    help="comma-separated registry names, or 'all'")
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--warmups", type=int, default=1)
    args = ap.parse_args()

    from pii_redaction_pipeline_spark.functions.blocks import release
    from pii_redaction_pipeline_spark.queries import QUERIES
    from pii_redaction_pipeline_spark.session import get_spark

    spark = get_spark(app="bench_extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)

    names = (sorted(QUERIES) if args.queries == "all"
             else [q.strip() for q in args.queries.split(",")])
    out: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name][0]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.plans:
            plan_dir = REPO / args.plans
            plan_dir.mkdir(parents=True, exist_ok=True)
            import contextlib
            import io
            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (plan_dir / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
            release(df)

        def run():
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            release(df)

        for _ in range(args.warmups):
            run()
        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            run()
            walls.append(round(time.time() - t0, 3))
        out[name] = walls
        print(f"# {name}: {walls}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"sf": args.sf, "cpus": CPUS, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
