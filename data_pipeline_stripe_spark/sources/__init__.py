from .readers import (
    read_events_json,
    read_dim_csv,
    read_dim_rows,
    typed_events,
    load_table,
    load_tables,
)

__all__ = [
    "read_events_json",
    "read_dim_csv",
    "read_dim_rows",
    "typed_events",
    "load_table",
    "load_tables",
]
