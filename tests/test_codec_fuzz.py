"""Property-based fuzz gate on the builtin image decoders: NO payload
corruption may escape as anything but ``DecodeError`` (or decode
cleanly) — a malformed byte string must never crash a Spark task with
an arbitrary exception (IndexError deep in numpy, struct.error, ...).

Extends the round-2 crash-proofing (``codecs.decode`` wraps unexpected
exception types at ``codecs.py:177``): hypothesis drives random
truncations, bit flips, splices of valid payloads, and arbitrary junk
through every builtin codec. The kernel-level contract (a corrupt row
yields a violation row, not a task failure) is covered by
tests/test_images.py; this gate covers the decoder layer exhaustively.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sinter_spark.images import codecs

FMTS = ["raw", "png", "qjpg", "jpeg", "gif"]


def _valid_payload(fmt: str, seed: int = 7) -> bytes:
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    encoders = {
        "raw": codecs.encode_raw,
        "png": codecs.encode_png,
        "qjpg": codecs.encode_qjpg,
        "jpeg": codecs.ENCODERS["jpeg"],
        "gif": codecs.ENCODERS["gif"],
    }
    return encoders[fmt](arr)


def _assert_contained(fmt: str, data: bytes):
    """decode() must either succeed with a uint8 HxWxC array or raise
    DecodeError — anything else is a task-crash path."""
    try:
        out = codecs.decode(fmt, data)
    except codecs.DecodeError:
        return
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8 and out.ndim == 3


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    fmt=st.sampled_from(FMTS),
    junk=st.binary(min_size=0, max_size=400),
)
def test_arbitrary_junk_never_escapes(fmt, junk):
    _assert_contained(fmt, junk)


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    fmt=st.sampled_from(FMTS),
    cut=st.integers(min_value=0, max_value=1_000_000),
)
def test_truncation_never_escapes(fmt, cut):
    data = _valid_payload(fmt)
    _assert_contained(fmt, data[: cut % (len(data) + 1)])


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    fmt=st.sampled_from(FMTS),
    pos=st.integers(min_value=0, max_value=1_000_000),
    bit=st.integers(min_value=0, max_value=7),
)
def test_bit_flips_never_escape(fmt, pos, bit):
    data = bytearray(_valid_payload(fmt))
    data[pos % len(data)] ^= 1 << bit
    _assert_contained(fmt, bytes(data))


@settings(max_examples=150, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    fmt=st.sampled_from(FMTS),
    other=st.sampled_from(FMTS),
    split=st.integers(min_value=0, max_value=1_000_000),
)
def test_cross_format_splices_never_escape(fmt, other, split):
    """Half of one format's payload glued to half of another's — the
    header-looks-right-body-is-wrong class."""
    a, b = _valid_payload(fmt), _valid_payload(other, seed=11)
    cut = split % (min(len(a), len(b)) + 1)
    _assert_contained(fmt, a[:cut] + b[cut:])


def test_unknown_fmt_is_decode_error():
    with pytest.raises(codecs.DecodeError):
        codecs.decode("jpeg2000", b"anything")
