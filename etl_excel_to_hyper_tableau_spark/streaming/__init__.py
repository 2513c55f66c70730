from .events import (
    run_windowed_counts_availablenow, sessionize_batch, windowed_counts_stream,
)

__all__ = [
    "windowed_counts_stream", "run_windowed_counts_availablenow",
    "sessionize_batch",
]
