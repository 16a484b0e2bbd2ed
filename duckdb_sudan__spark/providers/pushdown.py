"""Year-range filter pushdown → provider-native URL filter syntax.

Parity: reference `src/sudan/filter_pushdown.cpp:6-99`. A year range
extracted from the query (or passed explicitly) is encoded into each
API's own filter parameters, so the fetch — not Spark — drops
out-of-range rows. Residual predicates stay in Catalyst and are
additionally applied post-fetch, which keeps semantics correct even
when an API ignores its filter parameter.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class YearFilter:
    """Closed year range; 0 means unbounded on that side."""

    year_start: int = 0
    year_end: int = 0

    @property
    def active(self) -> bool:
        return self.year_start > 0 or self.year_end > 0

    def contains(self, year: int) -> bool:
        if self.year_start > 0 and year < self.year_start:
            return False
        if self.year_end > 0 and year > self.year_end:
            return False
        return True


def encode_worldbank(f: YearFilter) -> str:
    # date=START:END (filter_pushdown.cpp:6-20)
    if not f.active:
        return ""
    if f.year_start > 0 and f.year_end > 0:
        return f"date={f.year_start}:{f.year_end}"
    if f.year_start > 0:
        return f"date={f.year_start}:2100"
    return f"date=1900:{f.year_end}"


def encode_who(f: YearFilter) -> str:
    # OData: $filter=TimeDim ge X and TimeDim le Y (filter_pushdown.cpp:22-40)
    if not f.active:
        return ""
    parts = []
    if f.year_start > 0:
        parts.append(f"TimeDim ge {f.year_start}")
    if f.year_end > 0:
        parts.append(f"TimeDim le {f.year_end}")
    return "$filter=" + " and ".join(parts)


def _amp_pair(f: YearFilter, start_key: str, end_key: str) -> str:
    if not f.active:
        return ""
    parts = []
    if f.year_start > 0:
        parts.append(f"{start_key}={f.year_start}")
    if f.year_end > 0:
        parts.append(f"{end_key}={f.year_end}")
    return "&".join(parts)


def encode_fao(f: YearFilter) -> str:
    # year_start=&year_end= (filter_pushdown.cpp:42-59)
    return _amp_pair(f, "year_start", "year_end")


def encode_unhcr(f: YearFilter) -> str:
    # yearFrom=&yearTo= (filter_pushdown.cpp:61-78)
    return _amp_pair(f, "yearFrom", "yearTo")


def encode_ilo(f: YearFilter) -> str:
    # startPeriod=&endPeriod= (filter_pushdown.cpp:80-97)
    return _amp_pair(f, "startPeriod", "endPeriod")


ENCODERS = {
    "worldbank": encode_worldbank,
    "who": encode_who,
    "fao": encode_fao,
    "unhcr": encode_unhcr,
    "ilo": encode_ilo,
}
