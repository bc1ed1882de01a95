from python_etl_spark.sinks.writers import write_csv, write_json, write_parquet  # noqa: F401
