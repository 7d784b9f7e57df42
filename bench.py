"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized through the noop sink (no driver-side
collect of wide results; nothing is pruned by a count()). Every query runs
TWICE and the second (steady-state) time is reported: the first execution
pays one-off costs — scan-cache population, codegen compilation, Python
worker spin-up — that are amortized away in any sustained workload, and
their inclusion makes single-shot numbers swing ±30% with machine noise.
Set BENCH_COLD=1 to report first-run (cold) times instead.

Methodology note: operators that persist shared subtrees module-globally
(the near-dup family) are released between the warm-up and the measured
run, so the steady-state number re-executes the full pipeline including
its own within-query materialization — cross-run cache hits would
otherwise measure the session cache, not the query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_regional_rollup",
    "dedup_keep_latest",
    "rolling_daily_metrics",
    "spatial_box_enrich",
    "band_join_classify",
    "agg_pricing_summary",
    "agg_global_kpi",
    "agg_monthly_rollup",
    "physics_suite",
    "sessionize_users",
    "text_quality_score",
    "exact_dedup_docs",
    "minhash_near_dup",
    "cosine_topk_bruteforce",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as ent
    from global_seismic_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()

    # Warm the JVM/reader paths once with an explicitly cheap query so the
    # first timed query doesn't pay session startup.
    qs["agg_frequency_table"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    from global_seismic_data_pipeline_spark.operators import neardup

    cold = os.environ.get("BENCH_COLD") == "1"
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        runs = 1 if cold else 2
        for i in range(runs):
            # drop module-persisted blocks so every run pays its own
            # materialization (within-run persist is the operator's design;
            # cross-run reuse would be a cache benchmark)
            neardup.release_cached()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
    neardup.release_cached()

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
