from . import datetime_fns, json_fns, text_fns, vector_fns

__all__ = ["datetime_fns", "json_fns", "text_fns", "vector_fns"]
