#!/usr/bin/env python
"""Dump .explain("formatted") for the headline queries (and any extras
given on the CLI) into plans/r15/<query>_<tag>.txt.

Usage: python scripts/dump_r15_plans.py <tag> [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from python_etl_spark.plans import QUERIES
    from python_etl_spark.session import get_spark

    spark = get_spark("plans-r15")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs("plans/r15", exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r15/{name}_{tag}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"wrote plans/r15/{name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
