from duckdb_sudan__spark.geo.states import (
    SUDAN_STATES,
    geocode_expr,
    register_geocode_udf,
    state_boundary_geojson,
    sudan_boundaries,
    sudan_geocode,
    sudan_states,
)

__all__ = [
    "SUDAN_STATES",
    "geocode_expr",
    "register_geocode_udf",
    "state_boundary_geojson",
    "sudan_boundaries",
    "sudan_geocode",
    "sudan_states",
]
