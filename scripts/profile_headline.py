#!/usr/bin/env python
"""Profile the headline bench queries one by one (guide §1).

For each query: time the DataFrame *construction* (Python plan
building + py4j traffic), the Catalyst analysis, and the execution
via the noop sink (computes every column, §1.4) AND via .count()
(the bench's timed action), and count the Spark jobs each action
spawned (scheduling rounds are real overhead at interactive sizes).

Usage: python scripts/profile_headline.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:] or HEADLINE
    from python_etl_spark.plans import QUERIES
    from python_etl_spark.session import get_spark

    spark = get_spark("profile")
    sc = spark.sparkContext
    spark.sparkContext.setLogLevel("ERROR")

    # warmup pass (same methodology as bench.py)
    for name in only:
        QUERIES[name](spark, sf_dir).count()

    rows = []
    for name in only:
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.schema  # force analysis
        t2 = time.perf_counter()
        jobs_before = len(sc.statusTracker().getJobIdsForGroup(name))
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        jobs_noop = len(sc.statusTracker().getJobIdsForGroup(name)) - jobs_before
        # fresh build for the count path (mirrors bench.py's timed pass)
        t4 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        t5 = time.perf_counter()
        jobs_count = (
            len(sc.statusTracker().getJobIdsForGroup(name)) - jobs_before - jobs_noop
        )
        sc.setJobGroup("", "")
        rows.append(
            {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "analyze_s": round(t2 - t1, 3),
                "noop_s": round(t3 - t2, 3),
                "bench_like_s": round(t5 - t4, 3),
                "jobs_noop": jobs_noop,
                "jobs_count": jobs_count,
                "rows": n,
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)

    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
