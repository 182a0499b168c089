from .tables import load_all, load_table, register_views

__all__ = ["load_all", "load_table", "register_views"]
