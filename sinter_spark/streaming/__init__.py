from .dedup_stream import dedup_stream, dedup_stream_exact, with_fingerprint
from .drift_stream import drift_scores, windowed_histogram
from .neardup_stream import minhash_signatures_stream, neardup_stream
from .validate_stream import streaming_validate, windowed_violation_counts

__all__ = [
    "dedup_stream",
    "dedup_stream_exact",
    "drift_scores",
    "minhash_signatures_stream",
    "neardup_stream",
    "streaming_validate",
    "windowed_histogram",
    "windowed_violation_counts",
    "with_fingerprint",
]
