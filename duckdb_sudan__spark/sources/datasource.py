"""PySpark Python DataSource for the sudan providers — the Spark-native
equivalent of a DuckDB table function.

`spark.read.format("sudan").options(provider=..., ...)` plans one
input partition per country: on a cluster, each (country) fetch runs
on its own executor — the 3-phase Bind/Init/Execute model of the
reference (wb_functions.cpp:44-280) maps to
schema()/partitions()/read(partition).

Bind-phase validation happens on the DRIVER in `SudanReader.__init__`
(provider name, required parameters, country codes), raising the same
"SUDAN: ..." messages as the api functions — mirroring the reference's
Bind errors instead of a raw executor-side KeyError.

Year-range pushdown is driven by the DataSource filter-pushdown API:
`SudanReader.pushFilters` absorbs year >=/>/<=/</== predicates from
the WHERE clause into a YearFilter (the Spark analogue of
filter_pushdown.cpp:6-99 extracting the range from duckdb's
TableFilterSet) and returns every other filter as residual for
Catalyst to evaluate. Explicit `year_start`/`year_end` options are
still honored and combined (intersection) with pushed filters.

Offline mode (default: `offline=true`) serves the deterministic
embedded samples; `offline=false` runs the per-country fetch loops in
providers/http.py on the EXECUTOR that owns the country partition,
falling back to that country's samples when the fetch yields nothing.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

from duckdb_sudan__spark.providers import http, samples
from duckdb_sudan__spark.providers.pushdown import YearFilter
from duckdb_sudan__spark.providers.registry import resolve_countries, validate_country_codes

# provider → (sample row builder taking (opts, countries), year column index)
_PROVIDER_META = {
    "worldbank": (lambda opts, cs: samples.worldbank_rows(opts["indicator"], cs), 4),
    "who": (lambda opts, cs: samples.who_rows(opts["indicator"], cs), 3),
    "fao": (lambda opts, cs: samples.fao_rows(opts["dataset"], opts["element"], cs), 4),
    "unhcr": (lambda opts, cs: samples.unhcr_rows(opts["population_type"], cs), 0),
    "ilo": (lambda opts, cs: samples.ilo_rows(opts["indicator"], cs), 4),
}

# provider → live fetch for ONE country (reference Init loops)
_PROVIDER_FETCH = {
    "worldbank": lambda opts, iso3, yf, st: http.fetch_worldbank_pages(opts["indicator"], iso3, yf, st),
    "who": lambda opts, iso3, yf, st: http.fetch_who(opts["indicator"], iso3, yf, st),
    "fao": lambda opts, iso3, yf, st: http.fetch_fao(opts["dataset"], opts["element"], iso3, yf, st),
    "unhcr": lambda opts, iso3, yf, st: http.fetch_unhcr(opts["population_type"], iso3, yf, st),
    "ilo": lambda opts, iso3, yf, st: http.fetch_ilo(opts["indicator"], iso3, yf, st),
}

# provider → required string options checked at bind time (reference
# Bind functions; fao defaults mirror the api test surface)
_REQUIRED_OPTIONS = {
    "worldbank": ("indicator",),
    "who": ("indicator",),
    "fao": ("dataset", "element"),
    "unhcr": ("population_type",),
    "ilo": ("indicator",),
}

_OPTION_DEFAULTS = {
    "fao": {"dataset": "QCL", "element": "production"},
    "unhcr": {"population_type": "refugees"},
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

_YEAR_COLUMN = ("year",)


class _CountryPartition(InputPartition):
    def __init__(self, iso3: str):
        self.iso3 = iso3


class SudanReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        self.provider = self.options.get("provider", "worldbank")
        if self.provider not in _PROVIDER_META:
            raise ValueError(
                f"SUDAN: Unknown provider '{self.provider}'. Valid: {', '.join(sorted(_PROVIDER_META))}."
            )
        for key, default in _OPTION_DEFAULTS.get(self.provider, {}).items():
            self.options.setdefault(key, default)
        # bind-phase validation on the driver — same messages as api.py
        for key in _REQUIRED_OPTIONS[self.provider]:
            if not self.options.get(key):
                raise ValueError(f"SUDAN: The {key} parameter cannot be empty.")
        if self.provider == "unhcr":
            ptype = self.options["population_type"]
            if ptype not in samples.UNHCR_POPULATION_TYPES:
                raise ValueError(
                    f"SUDAN: Invalid population_type '{ptype}'. "
                    f"Valid: {', '.join(samples.UNHCR_POPULATION_TYPES)}."
                )
        countries = self.options.get("countries")
        requested = countries.split(",") if countries else None
        if requested and not validate_country_codes(requested):
            raise ValueError(
                "SUDAN: Invalid country code. Supported: SDN, EGY, ETH, TCD, SSD, ERI, LBY, CAF (ISO2 also accepted)."
            )
        self.countries = resolve_countries(requested)
        self.offline = str(self.options.get("offline", "true")).lower() != "false"
        self.year_filter = YearFilter(
            int(self.options.get("year_start", 0)), int(self.options.get("year_end", 0))
        )

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb year-range predicates from the WHERE clause; every
        other filter is returned unhandled (Catalyst keeps evaluating
        it). Pushed bounds intersect with explicit year_start/year_end
        options — the same range-extraction contract as the
        reference's filter_pushdown.cpp."""
        start, end = self.year_filter.year_start, self.year_filter.year_end

        def tighten_start(v: int) -> None:
            nonlocal start
            start = max(start, v)

        def tighten_end(v: int) -> None:
            nonlocal end
            end = min(end, v) if end > 0 else v

        # a predicate is absorbed ONLY when its tightened bound stays >= 1:
        # YearFilter uses 0 as the "unbounded" sentinel, so folding e.g.
        # `year < 1` / `year <= 0` / `year = 0` into the struct would turn
        # an excluding predicate into no filter at all (parse_* map
        # unparseable years to 0, so `year = 0` is a realistic query).
        # Degenerate bounds stay residual and Catalyst evaluates them.
        residual: list[Filter] = []
        for f in filters:
            handled = False
            if getattr(f, "attribute", None) == _YEAR_COLUMN and isinstance(getattr(f, "value", None), int):
                if isinstance(f, GreaterThanOrEqual) and f.value >= 1:
                    tighten_start(f.value)
                    handled = True
                elif isinstance(f, GreaterThan) and f.value + 1 >= 1:
                    tighten_start(f.value + 1)
                    handled = True
                elif isinstance(f, LessThanOrEqual) and f.value >= 1:
                    tighten_end(f.value)
                    handled = True
                elif isinstance(f, LessThan) and f.value - 1 >= 1:
                    tighten_end(f.value - 1)
                    handled = True
                elif isinstance(f, EqualTo) and f.value >= 1:
                    tighten_start(f.value)
                    tighten_end(f.value)
                    handled = True
            if not handled:
                residual.append(f)
        # eager (not a generator): the absorbed range must be visible in
        # self.year_filter before partitions()/read() are planned
        self.year_filter = YearFilter(start, end)
        return residual

    def partitions(self):
        # one fetch unit per country — the unit of parallelism on a cluster
        return [_CountryPartition(c) for c in self.countries]

    def read(self, partition: _CountryPartition) -> Iterator[tuple]:
        build, year_idx = _PROVIDER_META[self.provider]
        rows: list[tuple] = []
        if not self.offline:
            # optional scheme+host override (mirror, corporate proxy,
            # loopback test server). read() runs in a Python worker
            # process, so the module-global must be set HERE, not on the
            # driver — driver-side mutation never reaches the worker.
            base_url = self.options.get("base_url", "")
            if base_url:
                for k in http.PROVIDER_BASES:
                    http.PROVIDER_BASES[k] = base_url
            rows = _PROVIDER_FETCH[self.provider](self.options, partition.iso3, self.year_filter, None)
        if not rows:
            rows = build(self.options, [partition.iso3])
        if self.year_filter.active:
            rows = [r for r in rows if self.year_filter.contains(r[year_idx])]
        yield from rows


class SudanStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the provider table function:
    `spark.readStream.format("sudan")` emits provider rows
    incrementally BY YEAR — the natural refresh unit for indicator
    APIs (a production deployment polls for newly published years; the
    offline form replays the embedded sample's year sequence
    deterministically, which is what the rows-only driver entry and
    the batch-equivalence test pin).

    Offset = {"y": <index into the sorted year list>} — a restart from
    a checkpoint resumes at the first unemitted year. `read(start)`
    returns ALL pending years by default so `trigger(availableNow)`
    drains the source in one batch (the Simple reader contract treats
    one read() as one batch); `years_per_batch` trickles N years per
    micro-batch for incremental-mode tests and demos. Bind-phase
    validation is the same SudanReader path, so
    `readStream.format("sudan").option("provider", "nope")` raises the
    reference's Bind error at plan time."""

    def __init__(self, options: dict):
        # reuse the batch reader's bind validation + sample assembly
        self._bound = SudanReader(dict(options))
        self._per_batch = int(options.get("years_per_batch", 0) or 0)
        build, year_idx = _PROVIDER_META[self._bound.provider]
        rows = []
        for iso3 in self._bound.countries:
            rows.extend(build(self._bound.options, [iso3]))
        if self._bound.year_filter.active:
            rows = [r for r in rows if self._bound.year_filter.contains(r[year_idx])]
        self._year_idx = year_idx
        self._years = sorted({r[year_idx] for r in rows})
        self._by_year = {y: [r for r in rows if r[year_idx] == y] for y in self._years}

    def initialOffset(self) -> dict:
        return {"y": 0}

    def read(self, start: dict):
        i = start["y"]
        if i >= len(self._years):
            return iter([]), {"y": i}
        end = len(self._years) if self._per_batch <= 0 else min(i + self._per_batch, len(self._years))
        out = []
        for y in self._years[i:end]:
            out.extend(self._by_year[y])
        return iter(out), {"y": end}

    def commit(self, end: dict) -> None:
        pass


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

    def simpleStreamReader(self, schema) -> SudanStreamReader:
        return SudanStreamReader(self.options)


def register_sudan_datasource(spark) -> None:
    try:
        # runtime SQL conf, read at plan time: Spark refuses to plan a
        # pushFilters-bearing Python source while this is false
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # conf locked down (e.g. Connect policy) — session.py sets it at build
    spark.dataSource.register(SudanDataSource)
