from .tables import SCHEMAS, TABLES, load_table, register_views

__all__ = ["SCHEMAS", "TABLES", "load_table", "register_views"]
