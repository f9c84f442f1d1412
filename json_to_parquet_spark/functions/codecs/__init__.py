"""Codec kernels (numpy/pyarrow only — importable on executors without Spark)."""

from .column import (  # noqa: F401
    CODECS,
    decode_column,
    encode_column,
    meta_from_json,
    meta_to_json,
    type_from_str,
)
