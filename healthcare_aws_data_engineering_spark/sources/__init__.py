from .tables import load_table, load_tables, observation_view_from_events  # noqa: F401
