from .readers import (
    read_events_json,
    read_dim_csv,
    read_dim_rows,
    fetch_dim,
    typed_events,
    load_table,
    load_tables,
)

__all__ = [
    "read_events_json",
    "read_dim_csv",
    "read_dim_rows",
    "fetch_dim",
    "typed_events",
    "load_table",
    "load_tables",
]
