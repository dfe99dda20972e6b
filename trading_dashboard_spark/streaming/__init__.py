from .ingest import stream_events, run_stream_to_table, dedup_stream  # noqa: F401
from .windows import hourly_counts, session_aggregate  # noqa: F401
