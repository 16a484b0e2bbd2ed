"""duckdb_sudan__spark — a PySpark-native analytics engine with the
capabilities of the `duckdb-sudan` DuckDB extension
(Osman-Geomatics93/duckdb-sudan-), re-expressed Spark-first.

Reference surface (see SURVEY.md §2): 5 provider table functions, 4
discovery functions, 3 geospatial functions, 1 scalar geocoder, year
filter pushdown, response caching — plus the DuckDB-grade relational
surface on Spark SQL and LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.
"""

from duckdb_sudan__spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
