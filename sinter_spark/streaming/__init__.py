from .dedup_stream import dedup_stream, dedup_stream_exact, with_fingerprint
from .drift_stream import drift_scores, windowed_histogram
from .validate_stream import streaming_validate, windowed_violation_counts

__all__ = [
    "dedup_stream",
    "dedup_stream_exact",
    "drift_scores",
    "streaming_validate",
    "windowed_histogram",
    "windowed_violation_counts",
    "with_fingerprint",
]
