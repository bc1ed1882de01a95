"""End-to-end Pipeline API: extract -> transform -> load over real
parquet inputs, both fluent and spec-dict forms."""

from __future__ import annotations

from python_etl_spark.pipeline import Pipeline
from python_etl_spark.sources.readers import read_parquet


def test_pipeline_fluent(spark, sf_dir, tmp_path):
    out = str(tmp_path / "joined.parquet")
    result = (
        Pipeline(spark)
        .extract("orders", "parquet", f"{sf_dir}/orders.parquet")
        .extract("customer", "parquet", f"{sf_dir}/customer.parquet")
        .transform(
            "joined",
            lambda t: t["orders"].join(
                t["customer"],
                t["orders"].o_custkey == t["customer"].c_custkey,
            ),
        )
        .transform_sql(
            "big",
            "SELECT o_orderkey, c_name, o_totalprice FROM joined "
            "WHERE o_totalprice > 300000",
        )
        .load("big", "parquet", out, partition_by=["c_name"])
        .run()
    )
    assert result == {"big": out}
    back = read_parquet(spark, out)
    assert back.count() > 0
    assert set(back.columns) == {"o_orderkey", "c_name", "o_totalprice"}
    assert back.where("o_totalprice <= 300000").count() == 0


def test_pipeline_from_spec(spark, sf_dir, tmp_path):
    out = str(tmp_path / "spec_out.parquet")
    spec = {
        "extract": [
            {"name": "orders", "format": "parquet",
             "path": f"{sf_dir}/orders.parquet"},
        ],
        "transform_sql": [
            {"name": "by_status",
             "query": "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
                      "GROUP BY o_orderstatus"},
        ],
        "load": [
            {"name": "by_status", "format": "parquet", "path": out},
        ],
    }
    Pipeline.from_spec(spark, spec).run()
    back = read_parquet(spark, out)
    assert back.count() == 3  # statuses O/F/P


def test_example_pipeline_runs(spark, sf_dir, tmp_path, monkeypatch, capsys):
    """The shipped example must keep working end-to-end."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "llm_example", "examples/llm_data_pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(
        _sys, "argv", ["x", sf_dir, str(tmp_path / "out")]
    )
    # example calls get_spark/stop; reuse of the session-scoped spark is
    # fine (getOrCreate returns it) but it must not stop our fixture
    monkeypatch.setattr(
        type(spark), "stop", lambda self: None
    )
    mod.main()
    out = capsys.readouterr().out
    assert "ingested=" in out and "near_deduped=" in out


def test_pipeline_fixed_width_to_avro(spark, tmp_path):
    from python_etl_spark.pipeline import Pipeline
    from python_etl_spark.sources.avro import read_avro

    fw = tmp_path / "ledger.txt"
    fw.write_text("00001alpha     0001.50\n00002beta      0002.25\n")
    out = str(tmp_path / "out.avro")
    (
        Pipeline(spark)
        .extract(
            "ledger", "fixed_width", str(fw),
            colspecs=[
                ("id", 1, 5, "long"),
                ("name", 6, 10, "string"),
                ("amount", 16, 7, "double"),
            ],
        )
        .transform("big", lambda t: t["ledger"].where(t["ledger"].amount > 2))
        .load("big", "avro", out)
        .run()
    )
    assert sorted(tuple(r) for r in read_avro(spark, out).collect()) == [
        (2, "beta", 2.25)
    ]


def test_analytics_dashboard_example_runs(spark, sf_dir, tmp_path, monkeypatch, capsys):
    """The analytics example must materialize all four dashboard
    tables with sane contents."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "dash_example", "examples/analytics_dashboard.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "dash")
    monkeypatch.setattr(_sys, "argv", ["x", sf_dir, out])
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    mod.main()
    printed = capsys.readouterr().out
    assert "revenue_region_month=" in printed
    from pyspark.sql import functions as F

    rev = spark.read.parquet(f"{out}/revenue_region_month.parquet")
    assert rev.count() > 0
    assert rev.where(F.col("revenue") <= 0).count() == 0
    assert set(rev.columns) == {"region", "month", "revenue", "n_orders"}
    assert spark.read.parquet(f"{out}/engagement_daily.parquet").count() > 0


def test_observation_metrics_ride_the_write(spark, sf_dir, tmp_path):
    """observe() metrics are computed inside the action that runs the
    plan — no second scan: a filtered write surfaces row count, null
    counts and a value total that match a direct recomputation."""
    from pyspark.sql import functions as F

    from python_etl_spark.operators.metrics import (
        observe_metrics,
        row_health_metrics,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_orderstatus") == "F"
    )
    df, obs = observe_metrics(
        orders,
        "write_health",
        *row_health_metrics("o_custkey", "o_orderpriority"),
        F.sum("o_totalprice").alias("total_price"),
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    want_rows = orders.count()
    assert got["n_rows"] == want_rows
    assert got["n_null_o_custkey"] == 0
    assert got["n_null_o_orderpriority"] == 0
    assert abs(
        got["total_price"]
        - orders.agg(F.sum("o_totalprice")).first()[0]
    ) < 1e-6
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == want_rows


def test_retrieval_pipeline_example_runs(
    spark, sf_dir, monkeypatch, capsys
):
    """The retrieval example (ANN recall -> hybrid scoring -> MMR
    diversification) must run end-to-end and emit both stages'
    results."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "retrieval_example", "examples/retrieval_pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(_sys, "argv", ["x", sf_dir])
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    mod.main()
    out = capsys.readouterr().out
    assert "hybrid top-10" in out and "MMR-diversified top-5" in out
    assert "SQ8-index ADC top-10" in out
    assert "#1 doc" in out


def test_lakehouse_governance_example_runs(
    spark, sf_dir, tmp_path, monkeypatch, capsys
):
    """The governance example must drive the whole round-11 part-2
    story: constrained create, executor-side sink refusal, partition
    evolution, planner Z-order, zero-copy clone divergence, and the
    theta-vs-exact audience report."""
    import importlib.util
    import sys as _sys

    spec = importlib.util.spec_from_file_location(
        "governance_example", "examples/lakehouse_governance_pipeline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(_sys, "argv", ["x", sf_dir, str(tmp_path / "gov")])
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    mod.main()
    printed = capsys.readouterr().out
    assert "poisoned_batch_refused=True" in printed
    assert "evolved_layout=['priority']" in printed
    assert "optimize_actions=['compact_zorder']" in printed
    assert "governance_pipeline=done" in printed
