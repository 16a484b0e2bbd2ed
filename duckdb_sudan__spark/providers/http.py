"""Online fetch path: provider URL construction + HTTP JSON fetch.

Mirrors the reference http_client.cpp / per-provider Fetch functions
(URL shapes from wb_functions.cpp:110-123, and the equivalents in
who/fao/unhcr/ilo _functions.cpp). The container running tests has no
network — URL building is unit-tested, the fetch itself is gated and
returns [] on any failure, falling back to the offline samples.

Pagination (World Bank `pages` metadata) is fetched page-by-page with
the 300 s TTL response cache keyed by full URL, exactly like the
reference's Init phase.
"""

from __future__ import annotations

import json

from duckdb_sudan__spark.providers.cache import ResponseCache
from duckdb_sudan__spark.providers.pushdown import (
    YearFilter,
    encode_fao,
    encode_ilo,
    encode_unhcr,
    encode_who,
    encode_worldbank,
)

DEFAULT_TIMEOUT = 90


def build_worldbank_url(indicator: str, iso3: str, yf: YearFilter, page: int = 1) -> str:
    url = (
        f"https://api.worldbank.org/v2/country/{iso3}/indicator/{indicator}"
        f"?format=json&per_page=1000&page={page}"
    )
    year_param = encode_worldbank(yf)
    return f"{url}&{year_param}" if year_param else url


def build_who_url(indicator: str, iso3: str, yf: YearFilter) -> str:
    url = f"https://ghoapi.azureedge.net/api/{indicator}?$filter=SpatialDim eq '{iso3}'"
    year_param = encode_who(yf)
    if year_param:
        # merge into the existing $filter clause
        url += " and " + year_param.removeprefix("$filter=")
    return url


def build_fao_url(dataset: str, element: str, area_code: str, yf: YearFilter) -> str:
    url = f"https://faostatservices.fao.org/api/v1/en/data/{dataset}?area={area_code}&element={element}"
    year_param = encode_fao(yf)
    return f"{url}&{year_param}" if year_param else url


def build_unhcr_url(population_type: str, iso3: str, yf: YearFilter) -> str:
    url = f"https://api.unhcr.org/population/v1/{population_type}/?coo={iso3}&limit=1000"
    year_param = encode_unhcr(yf)
    return f"{url}&{year_param}" if year_param else url


def build_ilo_url(indicator: str, iso3: str, yf: YearFilter) -> str:
    url = f"https://sdmx.ilo.org/rest/data/ILO,DF_{indicator}/.{iso3}?format=jsondata"
    year_param = encode_ilo(yf)
    return f"{url}&{year_param}" if year_param else url


def http_get_json(url: str, timeout: int = DEFAULT_TIMEOUT) -> dict | list | None:
    """Cached GET → parsed JSON; None on any failure (offline, 4xx/5xx,
    bad JSON). Callers fall back to embedded samples."""
    cache = ResponseCache.instance()
    body = cache.get(url)
    if not body:
        try:
            from urllib.request import Request, urlopen

            req = Request(url, headers={"User-Agent": "duckdb_sudan__spark/0.1"})
            with urlopen(req, timeout=timeout) as resp:
                if resp.status != 200:
                    return None
                body = resp.read().decode("utf-8")
        except Exception:
            return None
        cache.put(url, body)
    try:
        return json.loads(body)
    except ValueError:
        return None


def fetch_worldbank_pages(indicator: str, iso3: str, yf: YearFilter) -> list[tuple]:
    """All pages for one (indicator, country) — the reference's
    FetchWorldBankData loop (wb_functions.cpp:110-210)."""
    rows: list[tuple] = []
    page, total_pages = 1, 1
    while page <= total_pages:
        doc = http_get_json(build_worldbank_url(indicator, iso3, yf, page))
        if not isinstance(doc, list) or len(doc) < 2:
            break
        meta, data = doc[0], doc[1]
        if isinstance(meta, dict) and isinstance(meta.get("pages"), int):
            total_pages = meta["pages"]
        if isinstance(data, list):
            for elem in data:
                ind = elem.get("indicator") or {}
                country = elem.get("country") or {}
                try:
                    year = int(elem.get("date") or 0)
                except ValueError:
                    year = 0
                value = elem.get("value")
                rows.append(
                    (
                        ind.get("id", ""),
                        ind.get("value", ""),
                        country.get("id", ""),
                        country.get("value", ""),
                        year,
                        float(value) if value is not None else None,
                    )
                )
        page += 1
    return rows
