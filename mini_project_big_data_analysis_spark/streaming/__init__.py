from .pipeline import (
    clean_event_stream,
    read_events_stream,
    run_tumbling_agg_availablenow,
    tumbling_agg,
)

__all__ = [
    "clean_event_stream",
    "read_events_stream",
    "run_tumbling_agg_availablenow",
    "tumbling_agg",
]
