"""python_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capability surface of the Python-ETL reference
(extract -> transform -> load over tabular data) as an idiomatic
Spark DataFrame engine, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale. See SURVEY.md for the capability inventory.
"""

__version__ = "0.1.0"

from python_etl_spark.session import get_spark  # noqa: F401
from python_etl_spark.sql import sql, sql_script  # noqa: F401
