#!/usr/bin/env python
"""The lakehouse from SQL alone (r11 verdict #7): everything an
analyst needs, no Python API in sight — ``python_etl_spark.sql`` is
the only import beyond the session.

1. CREATE the table (the one Python call — a bootstrap the platform
   team runs once), then hand the analyst a path.
2. MERGE a nightly changelog in: ``MERGE INTO vt'<path>' AS t USING
   (<subquery>) AS s ON t.k = s.k`` (the plain upsert), and a second
   MERGE with conditional clauses (``WHEN MATCHED AND ... THEN
   DELETE`` / ``WHEN NOT MATCHED THEN INSERT *``).
3. DELETE with a predicate (dir-pruned copy-on-write underneath).
4. Audit: DESCRIBE HISTORY (newest first), DESCRIBE DETAIL
   (footprint, invariants, DV pressure), VACUUM ... DRY RUN.
5. Time travel: SELECT ... FROM vt'<path>' VERSION AS OF 0 — and a
   diff query joining two versions of the SAME table in one
   statement.
6. Nightly maintenance: OPTIMIZE vt'<path>' [ZORDER BY (k, qty)];
   RESTORE ... TO VERSION AS OF n undoes a bad day.

Run: python examples/sql_lakehouse.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from python_etl_spark import get_spark, sql
from python_etl_spark.sinks.table import VersionedTable
from python_etl_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("sql_lakehouse")
    root = os.path.join(out, "orders_vt")

    # 1. bootstrap (platform team, once)
    orders = load_table(spark, sf_dir, "orders")
    t = VersionedTable(root)
    if not t.exists():
        t.create(
            orders.select(
                F.col("o_orderkey").cast("long").alias("k"),
                (F.col("o_orderkey") % 100).cast("long").alias("qty"),
                F.col("o_orderstatus").alias("status"),
            )
        )
    orders.createOrReplaceTempView("orders_raw")
    print(f"table at {root}, v{t.latest_version()}")

    # 2. nightly MERGE (upsert), then a conditional-clause MERGE
    sql(
        spark,
        f"""
        MERGE INTO vt'{root}' AS t
        USING (
          SELECT CAST(o_orderkey AS LONG) AS k,
                 CAST(o_orderkey % 100 + 1000 AS LONG) AS qty,
                 'U' AS status
          FROM orders_raw WHERE o_orderkey % 3 = 0
        ) AS s
        ON t.k = s.k
        """,
    ).show()
    sql(
        spark,
        f"""
        MERGE INTO vt'{root}' AS t
        USING (
          SELECT CAST(o_orderkey AS LONG) AS k,
                 CAST(0 AS LONG) AS qty, 'X' AS status
          FROM orders_raw WHERE o_orderkey % 97 = 0
        ) AS s
        ON t.k = s.k
        WHEN MATCHED AND t.qty < 50 THEN DELETE
        WHEN NOT MATCHED THEN INSERT *
        """,
    ).show()

    # 3. column-subset UPDATE, row INSERTs, predicate DELETE
    sql(
        spark,
        f"UPDATE vt'{root}' SET qty = qty + 5000 "
        f"WHERE status = 'P' AND k % 11 = 0",
    ).show()
    sql(
        spark,
        f"INSERT INTO vt'{root}' VALUES (990000001, 1, 'N'), "
        f"(990000002, 2, 'N')",
    ).show()
    sql(spark, f"DELETE FROM vt'{root}' WHERE status = 'F'").show()

    # 4. audit surface
    sql(spark, f"DESCRIBE HISTORY vt'{root}'").show(truncate=False)
    sql(spark, f"DESCRIBE DETAIL vt'{root}'").show(
        24, truncate=False
    )
    n_sweepable = sql(spark, f"VACUUM vt'{root}' DRY RUN").count()
    print(f"vacuum would sweep {n_sweepable} dirs (nothing removed)")

    # 5. time travel + cross-version diff in ONE statement
    sql(
        spark,
        f"""
        SELECT 'v0' AS snap, status, COUNT(*) AS n
        FROM vt'{root}' VERSION AS OF 0 GROUP BY status
        UNION ALL
        SELECT 'now', status, COUNT(*) FROM vt'{root}' GROUP BY status
        ORDER BY snap, status
        """,
    ).show()
    sql(
        spark,
        f"""
        SELECT COUNT(*) AS rows_deleted_since_v0
        FROM vt'{root}' VERSION AS OF 0 a
        LEFT ANTI JOIN vt'{root}' b ON a.k = b.k
        """,
    ).show()

    # 6. maintenance + undo
    sql(spark, f"OPTIMIZE vt'{root}' ZORDER BY (k, qty)").show(
        truncate=False
    )
    sql(spark, f"RESTORE vt'{root}' TO VERSION AS OF 0").show()
    print("restored; current rows:",
          sql(spark, f"SELECT COUNT(*) AS n FROM vt'{root}'").first().n)

    # 7. r13: give the table a NAME — paths disappear from every
    # later statement (catalog location set via session conf;
    # defaults to <warehouse>/_vt_catalog.json)
    sql(spark, f"CREATE OR REPLACE TABLE orders_live USING "
               f"versioned_table LOCATION '{root}'").show()
    sql(spark, "SELECT status, COUNT(*) AS n FROM orders_live "
               "GROUP BY status").show()

    # 8. r13: schema evolution in SQL — all metadata-only commits
    sql(spark, "ALTER TABLE orders_live ADD COLUMN discount double").show()
    sql(spark, "UPDATE orders_live SET discount = qty * 0.01 "
               "WHERE status = 'O'").show()
    sql(spark, "ALTER TABLE orders_live RENAME COLUMN discount "
               "TO rebate").show()
    sql(spark, "ALTER TABLE orders_live ADD CONSTRAINT rebate_pos "
               "CHECK (rebate IS NULL OR rebate >= 0)").show()
    try:
        sql(spark, "INSERT INTO orders_live VALUES "
                   "(990000003, 1, 'N', -1.0)")
    except Exception as e:
        print("constraint refused the bad insert:",
              type(e).__name__)

    # 9. r13: CDC in SQL — the change feed as a table function
    # (start AFTER the restore: a restore has no change feed, so the
    # range guard tells consumers to re-baseline — start at v7)
    sql(spark, "SELECT _change_type, COUNT(*) AS n "
               "FROM TABLE_CHANGES(orders_live, 7) "
               "GROUP BY _change_type").show()

    # 10. r13: the ingestion lifecycle without a line of Python —
    # schema-first CREATE, idempotent COPY INTO (re-running loads
    # ZERO files), subset MERGE, zero-copy clone, INSERT OVERWRITE,
    # TRUNCATE — as one sql_script
    from python_etl_spark import sql_script

    stage = os.path.join(out, "stage")
    load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k"),
        F.col("n_name").alias("name"),
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    ing = os.path.join(out, "ingested_vt")
    sql(spark, f"CREATE TABLE vt'{ing}' (k BIGINT, name STRING, "
               f"CONSTRAINT k_pos CHECK (k >= 0))")
    sql(spark, f"COPY INTO vt'{ing}' FROM '{stage}' "
               f"FILEFORMAT = PARQUET").show(truncate=False)
    print("re-run loads zero files:")
    sql(spark, f"COPY INTO vt'{ing}' FROM '{stage}' "
               f"FILEFORMAT = PARQUET").show(truncate=False)
    sql_script(
        spark,
        f"""
        -- column-subset MERGE: only the assigned column changes
        MERGE INTO vt'{ing}' AS t
        USING (SELECT CAST(0 AS LONG) AS k, 'RENAMED' AS nm) AS s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET t.name = s.nm;
        -- zero-copy experiment clone, then throw it away
        CREATE TABLE vt'{ing}_exp' SHALLOW CLONE vt'{ing}';
        INSERT OVERWRITE vt'{ing}_exp' VALUES (99, 'scratch');
        TRUNCATE TABLE vt'{ing}_exp';
        SELECT COUNT(*) AS n FROM vt'{ing}';
        """,
    ).show()

    # 11. r13: real VACUUM needs the explicit retention clause
    print("swept dirs:",
          sql(spark, "VACUUM orders_live RETAIN 168 HOURS").count())
    sql(spark, "DROP TABLE orders_live").show()  # name only; bytes stay


if __name__ == "__main__":
    main()
