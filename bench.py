"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully materialized (count + a cheap hash-ish aggregate via
collect on small results is avoided — we force execution with
``df.write.format("noop")`` semantics via count()).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from iatlas_cbioportal_export_spark import get_spark  # noqa: E402

HEADLINE = [
    "flagship_case_lists",
    "clinical_e2e_preprocess",
    "maf_annotate_pipeline",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "j1_broadcast_left_join",
    "j5_semi_join",
    "a1_case_lists",
    "a8_keep_latest",
    "f1_strip_suffix_first",
    "v_validation_suite",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "text_token_stats",
    "text_language_id",
    "stream_hourly_counts",
    "events_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries = entrymod.queries()
    # Warm the JVM once so the first timed query isn't charged session
    # startup: a trivial job plus one tiny parquet read (initializes the
    # Hadoop FS / datasource stack — measured ~3s on first touch).
    spark.range(1).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
