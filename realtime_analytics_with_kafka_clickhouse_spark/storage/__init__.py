from . import fs
from .layout import expire_ttl, read_orders_table, write_orders_table

__all__ = ["expire_ttl", "fs", "read_orders_table", "write_orders_table"]
