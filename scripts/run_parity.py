#!/usr/bin/env python
"""Run the oracle-parity harness from the CLI.

Usage: python scripts/run_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from python_etl_spark.session import get_spark  # noqa: E402
from python_etl_spark.testing import run_parity  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    spark = get_spark("parity")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_parity(spark, sf_dir, only=only)
    n_ok = sum(r.ok for r in results)
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        print(f"[{mark}] {r.name} (spark={r.spark_rows} oracle={r.oracle_rows}) {r.detail}")
        for d in r.diffs[:3]:
            print("   ", d.replace("\n", "\n    "))
    print(f"\n{n_ok}/{len(results)} parity checks pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
