from .checks import explain_str, assert_pushed_filters, assert_broadcast_join, scan_read_schema

__all__ = ["explain_str", "assert_pushed_filters", "assert_broadcast_join", "scan_read_schema"]
