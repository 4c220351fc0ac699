from .tables import (
    TABLES,
    broadcast_if_small,
    load_table,
    register_views,
    table_bytes,
)

__all__ = [
    "TABLES",
    "broadcast_if_small",
    "load_table",
    "register_views",
    "table_bytes",
]
