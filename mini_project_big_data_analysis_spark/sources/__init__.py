from .readers import read_table, read_json_events, TABLES
from .writers import append_parquet, json_roundtrip

__all__ = ["read_table", "read_json_events", "TABLES", "append_parquet", "json_roundtrip"]
