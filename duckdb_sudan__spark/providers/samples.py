"""Deterministic offline sample datasets for the 5 providers.

The container has no network access, so each provider ships an
embedded, formula-generated sample with the exact schema of the live
API result (reference schemas: wb_functions.cpp:81-92,
who_functions.cpp:77-90, fao_functions.cpp:81-94,
unhcr_functions.cpp:78-91, ilo_functions.cpp:75-86). Values are
SYNTHETIC — deterministic functions of (indicator, country, year) via
crc32 — not real statistics. The online fetch path
(providers/http.py) replaces this when the network is reachable.

Indicator catalogs use real public indicator *codes* (World Bank /
WHO GHO identifiers) so discovery functions behave like the
reference's.
"""

from __future__ import annotations

import zlib

from duckdb_sudan__spark.providers.registry import COUNTRIES, find_country

YEARS = tuple(range(2000, 2024))

# -- catalogs ----------------------------------------------------------------

# (indicator_id, indicator_name, source, source_note)
WB_INDICATORS: tuple[tuple[str, str, str, str], ...] = (
    ("SP.POP.TOTL", "Population, total", "World Development Indicators", "Total population counts all residents."),
    ("NY.GDP.MKTP.CD", "GDP (current US$)", "World Development Indicators", "GDP at purchaser's prices."),
    ("NY.GDP.PCAP.CD", "GDP per capita (current US$)", "World Development Indicators", "GDP divided by midyear population."),
    ("SH.STA.MMRT", "Maternal mortality ratio (modeled estimate, per 100,000 live births)", "World Development Indicators", "Maternal deaths per 100,000 live births."),
    ("SP.DYN.LE00.IN", "Life expectancy at birth, total (years)", "World Development Indicators", "Years a newborn would live."),
    ("SH.DYN.MORT", "Mortality rate, under-5 (per 1,000 live births)", "World Development Indicators", "Under-five mortality rate."),
    ("SE.PRM.ENRR", "School enrollment, primary (% gross)", "World Development Indicators", "Gross primary enrollment ratio."),
    ("SL.UEM.TOTL.ZS", "Unemployment, total (% of total labor force)", "World Development Indicators", "Share of labor force without work."),
    ("SP.URB.TOTL", "Urban population", "World Development Indicators", "People living in urban areas."),
    ("EN.POP.DNST", "Population density (people per sq. km of land area)", "World Development Indicators", "Midyear population per sq km."),
    ("AG.LND.AGRI.ZS", "Agricultural land (% of land area)", "World Development Indicators", "Share of land area that is agricultural."),
    ("SH.XPD.CHEX.GD.ZS", "Current health expenditure (% of GDP)", "World Development Indicators", "Health spending share of GDP."),
)

# (indicator_code, indicator_name)
WHO_INDICATORS: tuple[tuple[str, str], ...] = (
    ("MDG_0000000026", "Maternal mortality ratio (per 100 000 live births)"),
    ("MDG_0000000025", "Maternal mortality ratio (per 100 000 live births) (unrounded)"),
    ("WHOSIS_000001", "Life expectancy at birth (years)"),
    ("WHOSIS_000015", "Healthy life expectancy (HALE) at birth (years)"),
    ("MDG_0000000001", "Infant mortality rate (probability of dying between birth and age 1 per 1000 live births)"),
    ("MDG_0000000007", "Under-five mortality rate (probability of dying by age 5 per 1000 live births)"),
    ("WHS4_100", "Measles-containing-vaccine first-dose (MCV1) immunization coverage (%)"),
    ("WHS7_104", "Density of physicians (per 10 000 population)"),
    ("NUTRITION_ANT_HAZ_NE2", "Children aged <5 years stunted (%)"),
    ("M_Est_smk_curr_std", "Estimate of current tobacco smoking prevalence (%) (age-standardized)"),
)

WHO_SEXES = ("BTSX", "MLE", "FMLE")

# FAO QCL items with (element, unit) pairs
FAO_ITEMS: tuple[str, ...] = ("Wheat", "Sorghum", "Millet", "Sesame seed", "Groundnuts, with shell", "Sugar cane")
FAO_ELEMENT_UNITS = {"production": "t", "area_harvested": "ha", "yield": "kg/ha"}

UNHCR_POPULATION_TYPES = ("refugees", "idps", "asylum_seekers", "returnees", "stateless", "ooc")

# ILO SDMX indicator codes
ILO_INDICATORS: tuple[str, ...] = (
    "UNE_DEAP_SEX_AGE_RT",
    "EAP_DWAP_SEX_AGE_RT",
    "EMP_TEMP_SEX_AGE_NB",
    "UNE_TUNE_SEX_AGE_NB",
)
ILO_SEXES = ("SEX_T", "SEX_M", "SEX_F")
ILO_AGE_CLASSES = ("AGE_YTHADULT_YGE15", "AGE_YTHADULT_Y15-24", "AGE_YTHADULT_YGE25")


# -- deterministic value synthesis -------------------------------------------


def _h(*parts: object) -> int:
    return zlib.crc32("|".join(str(p) for p in parts).encode("utf-8"))


def _value(seed: int, year: int, lo: float, hi: float, trend: float = 0.0) -> float:
    """Deterministic pseudo-value in [lo, hi] with a linear trend."""
    frac = ((seed * 2654435761 + year * 40503) % 100000) / 100000.0
    base = lo + frac * (hi - lo)
    return round(base + trend * (year - 2000), 3)


def _is_gap(seed: int, year: int) -> bool:
    return (seed + year * 7) % 11 == 0


# -- per-provider row generators ---------------------------------------------


def worldbank_rows(indicator: str, countries: list[str]) -> list[tuple]:
    """(indicator_id, indicator_name, country, country_name, year, value|None)
    — `country` is the ISO2 code, as the live WB API returns."""
    name = next((n for i, n, _, _ in WB_INDICATORS if i == indicator), indicator)
    rows = []
    for iso3 in countries:
        c = find_country(iso3)
        iso2 = c.iso2 if c else iso3[:2]
        cname = c.name if c else iso3
        seed = _h("wb", indicator, iso3)
        for year in YEARS:
            value = None if _is_gap(seed, year) else _value(seed, year, 1e5, 5e7, trend=2e5)
            rows.append((indicator, name, iso2, cname, year, value))
    return rows


def who_rows(indicator: str, countries: list[str]) -> list[tuple]:
    """(indicator_code, indicator_name, country, year, sex, value|None, region)"""
    name = next((n for i, n in WHO_INDICATORS if i == indicator), indicator)
    rows = []
    for iso3 in countries:
        for sex in WHO_SEXES:
            seed = _h("who", indicator, iso3, sex)
            for year in YEARS:
                if (seed + year) % 3 == 0:  # WHO series are sparse
                    continue
                value = None if _is_gap(seed, year) else _value(seed, year, 5.0, 900.0, trend=-1.5)
                rows.append((indicator, name, iso3, year, sex, value, "EMR"))
    return rows


def fao_rows(dataset: str, element: str, countries: list[str]) -> list[tuple]:
    """(dataset, area, item, element, year, value|None, unit)"""
    unit = FAO_ELEMENT_UNITS.get(element, "t")
    rows = []
    for iso3 in countries:
        c = find_country(iso3)
        area = c.name if c else iso3
        for item in FAO_ITEMS:
            seed = _h("fao", dataset, element, iso3, item)
            for year in YEARS:
                value = None if _is_gap(seed, year) else _value(seed, year, 1e3, 8e6, trend=1e3)
                rows.append((dataset, area, item, element, year, value, unit))
    return rows


def unhcr_rows(population_type: str, countries: list[str]) -> list[tuple]:
    """(year, population_type, country_origin, country_origin_name,
    country_asylum, country_asylum_name, value)"""
    rows = []
    for iso3 in countries:
        origin = find_country(iso3)
        oname = origin.name if origin else iso3
        if population_type in ("idps", "returnees", "stateless", "ooc"):
            asylum_list = [iso3]  # in-country populations
        else:
            asylum_list = [c.iso3 for c in COUNTRIES if c.iso3 != iso3]
        for asylum_iso3 in asylum_list:
            asylum = find_country(asylum_iso3)
            aname = asylum.name if asylum else asylum_iso3
            seed = _h("unhcr", population_type, iso3, asylum_iso3)
            for year in YEARS:
                if (seed + year) % 4 == 0:
                    continue
                value = int(_value(seed, year, 1e3, 2.5e6, trend=5e3))
                rows.append((year, population_type, iso3, oname, asylum_iso3, aname, value))
    return rows


def ilo_rows(indicator: str, countries: list[str]) -> list[tuple]:
    """(indicator, country, sex, classif1, year, value|None)"""
    rows = []
    for iso3 in countries:
        for sex in ILO_SEXES:
            for classif1 in ILO_AGE_CLASSES:
                seed = _h("ilo", indicator, iso3, sex, classif1)
                for year in YEARS:
                    if (seed + year) % 5 == 0:
                        continue
                    value = None if _is_gap(seed, year) else _value(seed, year, 2.0, 60.0, trend=0.1)
                    rows.append((indicator, iso3, sex, classif1, year, value))
    return rows
