from . import fs
from .layout import delete_rows, expire_ttl, read_orders_table, write_orders_table

__all__ = ["delete_rows", "expire_ttl", "fs", "read_orders_table", "write_orders_table"]
