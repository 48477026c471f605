from .validate_stream import streaming_validate, windowed_violation_counts

__all__ = ["streaming_validate", "windowed_violation_counts"]
