"""Image+caption table: codecs, deterministic synthesis, decode kernel,
and the flagship full-suite validation (SURVEY.md §7.1 steps 2/7)."""

from .codecs import DECODERS, ENCODERS, LOSSY_FMTS, DecodeError, decode, psnr
from .kernel import PSNR_MIN_DB, decode_violations
from .suite import image_schema, validate_images_full
from .synth import (
    IMAGE_DDL,
    expected_caption,
    fmt_dim,
    generate_images,
    make_row,
    phash64,
    render_reference,
    uuid_for,
    write_images,
)

__all__ = [
    "DECODERS",
    "ENCODERS",
    "IMAGE_DDL",
    "LOSSY_FMTS",
    "PSNR_MIN_DB",
    "DecodeError",
    "decode",
    "decode_violations",
    "expected_caption",
    "fmt_dim",
    "generate_images",
    "image_schema",
    "make_row",
    "phash64",
    "psnr",
    "render_reference",
    "uuid_for",
    "validate_images_full",
    "write_images",
]
