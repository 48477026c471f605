from .dedup_stream import dedup_stream, dedup_stream_exact, with_fingerprint
from .validate_stream import streaming_validate, windowed_violation_counts

__all__ = [
    "dedup_stream",
    "dedup_stream_exact",
    "streaming_validate",
    "windowed_violation_counts",
    "with_fingerprint",
]
