"""Integer-lane codecs: frame-of-reference + bit-packing, and RLE.

These are the building blocks every other codec reuses (dictionary codes,
string offsets, run lengths are all integer streams).

All arithmetic is done in uint64 with two's-complement wraparound so the
full int64 domain round-trips exactly — the reference silently truncates
long→int32 at write time (reference src/Writer.java:98-99); this engine
treats that as a bug class and has non-regression tests at ±2^63 bounds.
"""

from __future__ import annotations

import numpy as np

from .bitutil import bit_width, bitpack, bitunpack

# --- frame-of-reference + bit-pack ------------------------------------------


def for_encode(vals: np.ndarray) -> tuple[dict[str, bytes], dict]:
    """Encode int64 values as (min-ref, bit-packed deltas).

    Returns (sections, meta). meta: {"n", "ref", "width"}.
    """
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(vals)
    if n == 0:
        return {}, {"n": 0, "ref": 0, "width": 0}
    vmin = int(vals.min())
    # wraparound-safe deltas: (v - min) mod 2^64 is always the true
    # non-negative distance even when v - min overflows int64
    deltas = vals.view(np.uint64) - np.uint64(vmin & 0xFFFFFFFFFFFFFFFF)
    width = bit_width(int(deltas.max()))
    return {"p": bitpack(deltas, width)}, {"n": n, "ref": vmin, "width": width}


def for_decode(sections: dict[str, bytes], meta: dict) -> np.ndarray:
    n = meta["n"]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    deltas = bitunpack(sections.get("p", b""), meta["width"], n)
    return (deltas + np.uint64(meta["ref"] & 0xFFFFFFFFFFFFFFFF)).view(np.int64)


# --- delta (+FOR+bitpack) -----------------------------------------------------


def delta_encode(vals: np.ndarray) -> tuple[dict[str, bytes], dict]:
    """First value + FOR-packed consecutive deltas (wraparound-safe).

    Wins over plain FOR when values are locally sorted — which the chunk
    encoder arranges by permuting rows (sort by low-cardinality columns,
    then timestamps; see operators/encode.py). Classic RLE/permutation
    synergy (cf. 'Column Partition and Permutation for Run Length
    Encoding', SIGMOD 2020)."""
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    n = len(vals)
    if n == 0:
        return {}, {"n": 0, "first": 0, "deltas": {"n": 0, "ref": 0,
                                                   "width": 0}}
    u = vals.view(np.uint64)
    deltas = (u[1:] - u[:-1]).view(np.int64)  # mod 2^64 → exact inverse
    dsec, dmeta = for_encode(deltas)
    return ({"d." + k: v for k, v in dsec.items()},
            {"n": n, "first": int(vals[0]), "deltas": dmeta})


def delta_decode(sections: dict[str, bytes], meta: dict) -> np.ndarray:
    n = meta["n"]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    dsec = {k[2:]: v for k, v in sections.items() if k.startswith("d.")}
    deltas = for_decode(dsec, meta["deltas"]).view(np.uint64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(meta["first"] & 0xFFFFFFFFFFFFFFFF)
    np.cumsum(deltas, out=out[1:], dtype=np.uint64)
    out[1:] += out[0]
    return out.view(np.int64)


# --- run-length encoding ------------------------------------------------------


def runs_of(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split an array into (run_values, run_lengths). Works on any dtype
    supporting !=; floats are compared via their uint64 bit patterns by the
    caller so NaN payloads round-trip."""
    n = len(vals)
    if n == 0:
        return vals[:0], np.empty(0, dtype=np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(vals[1:], vals[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    run_vals = vals[starts]
    run_lens = np.diff(np.append(starts, n)).astype(np.int64)
    return run_vals, run_lens


def rle_encode(vals: np.ndarray) -> tuple[dict[str, bytes], dict]:
    """RLE for an int64 lane: run values FOR-packed + run lengths FOR-packed."""
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    run_vals, run_lens = runs_of(vals)
    vsec, vmeta = for_encode(run_vals)
    lsec, lmeta = for_encode(run_lens)
    sections = {"v." + k: v for k, v in vsec.items()}
    sections.update({"l." + k: v for k, v in lsec.items()})
    return sections, {"n": int(len(vals)), "vals": vmeta, "lens": lmeta}


def rle_decode(sections: dict[str, bytes], meta: dict) -> np.ndarray:
    vsec = {k[2:]: v for k, v in sections.items() if k.startswith("v.")}
    lsec = {k[2:]: v for k, v in sections.items() if k.startswith("l.")}
    run_vals = for_decode(vsec, meta["vals"])
    run_lens = for_decode(lsec, meta["lens"])
    return np.repeat(run_vals, run_lens)
