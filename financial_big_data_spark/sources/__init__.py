from .tables import TABLE_SCHEMAS, load_table, load_tables, register_views

__all__ = ["TABLE_SCHEMAS", "load_table", "load_tables", "register_views"]
