from .tables import TABLES, load_table, prepare_session, register_views

__all__ = ["TABLES", "load_table", "prepare_session", "register_views"]
