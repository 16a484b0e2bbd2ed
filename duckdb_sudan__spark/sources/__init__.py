from duckdb_sudan__spark.sources.datasource import SudanDataSource, register_sudan_datasource

__all__ = ["SudanDataSource", "register_sudan_datasource"]
