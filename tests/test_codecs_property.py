"""Property-based round-trip tests (hypothesis): every codec must be
bit-exact on arbitrary inputs — including the reference's bug classes
(int64 overflow boundaries, reference src/Writer.java:98-102)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from json_to_parquet_spark.functions.codecs.column import (decode_column,
                                                           encode_column)

CODECS = ["plain", "for", "rle", "dict", "fsst", "delta"]

int64s = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)
opt_int = st.one_of(st.none(), int64s)
opt_text = st.one_of(st.none(), st.text(max_size=40))
opt_bytes = st.one_of(st.none(), st.binary(max_size=40))
opt_float = st.one_of(st.none(), st.floats(allow_nan=True, width=64),
                      st.just(float("inf")), st.just(-0.0))


def roundtrip(arr, codec):
    payload, meta = encode_column(arr, codec)
    out = decode_column(payload, meta)
    assert out.type == arr.type
    # NaN-safe comparison: compare raw bit patterns via to_pylist w/ NaN
    a, b = arr.to_pylist(), out.to_pylist()
    assert len(a) == len(b)
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float) \
                and np.isnan(x) and np.isnan(y):
            continue
        assert x == y, (codec, x, y)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(opt_int, max_size=120), codec=st.sampled_from(CODECS))
def test_int64_roundtrip(vals, codec):
    roundtrip(pa.array(vals, type=pa.int64()), codec)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(opt_text, max_size=80), codec=st.sampled_from(CODECS))
def test_string_roundtrip(vals, codec):
    roundtrip(pa.array(vals, type=pa.string()), codec)


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(opt_bytes, max_size=80), codec=st.sampled_from(CODECS))
def test_binary_roundtrip(vals, codec):
    roundtrip(pa.array(vals, type=pa.binary()), codec)


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(opt_float, max_size=80),
       codec=st.sampled_from(["plain", "rle", "dict"]))
def test_double_roundtrip(vals, codec):
    roundtrip(pa.array(vals, type=pa.float64()), codec)


@settings(max_examples=20, deadline=None)
@given(vals=st.lists(st.one_of(st.none(), st.integers(-2**43, 2**43)),
                     max_size=60),
       codec=st.sampled_from(CODECS))
def test_timestamp_roundtrip(vals, codec):
    roundtrip(pa.array(vals, type=pa.timestamp("us")), codec)


@settings(max_examples=20, deadline=None)
@given(vals=st.lists(st.one_of(st.none(), st.booleans()), max_size=60),
       codec=st.sampled_from(["plain", "rle"]))
def test_bool_roundtrip(vals, codec):
    roundtrip(pa.array(vals, type=pa.bool_()), codec)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.dictionaries(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
            min_size=1, max_size=8),
    st.one_of(st.integers(-2**31, 2**31), st.text(max_size=20),
              st.booleans(), st.none()),
    max_size=4), min_size=1, max_size=8),
    st.sampled_from(["", " ", "\n", "\t\n "]))
def test_concat_splitter_property(docs, sep):
    """Concatenating arbitrary JSON objects (any separator, incl. none)
    and splitting must recover exactly the original documents."""
    import json as _json

    from json_to_parquet_spark.sources.ingest import _split_concat_docs
    rendered = [_json.dumps(d, ensure_ascii=False) for d in docs]
    blob = sep.join(rendered)
    got = _split_concat_docs(blob)
    assert [_json.loads(g) for g in got] == docs


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_fsst_apply_table_roundtrip_property(data):
    """Direct kernel property: whenever encode applies, decode restores
    the exact bytes (hits the end-of-blob window, free-code, and empty
    paths on random binary)."""
    from json_to_parquet_spark.functions.codecs import fsst
    res = fsst.encode(data)
    if res is None:
        return  # inapplicable (no free codes / no gain) is a valid outcome
    enc, symbols, codes = res
    assert len(enc) < len(data)
    assert fsst.decode(enc, symbols, codes) == data
