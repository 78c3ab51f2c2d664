from .pipelines import (  # noqa: F401
    run_stream_to_memory,
    streaming_dedup,
    windowed_event_counts,
)
