from duckdb_sudan__spark.providers.registry import (
    COUNTRIES,
    PROVIDERS,
    find_country,
    find_provider,
    normalize_country_code,
    validate_country_codes,
)

__all__ = [
    "COUNTRIES",
    "PROVIDERS",
    "find_country",
    "find_provider",
    "normalize_country_code",
    "validate_country_codes",
]
