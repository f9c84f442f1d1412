"""Bit-level primitives shared by all codecs: bit-packing and a tiny
named-section binary container.

Everything here is vectorized numpy — these run inside Arrow batches on
executors (mapInPandas / applyInPandas), so per-element Python is forbidden.

Capability ancestor: the RLE/bit-packed encoding parquet-mr applies
implicitly for the reference (reference src/Writer.java:25-26 uses
ExampleParquetWriter defaults); here the packing is explicit and ours.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"J2PS"
_VERSION = 1


def bit_width(max_delta: int) -> int:
    """Bits needed to represent values in [0, max_delta]. 0 for constant."""
    if max_delta <= 0:
        return 0
    return int(max_delta).bit_length()


def bitpack(vals: np.ndarray, width: int) -> bytes:
    """Pack unsigned ints (given as uint64) into `width`-bit little-endian-ish
    bit stream. width == 0 → empty payload (all values are zero).
    width == 64 → raw bytes (packing is a no-op)."""
    n = len(vals)
    if n == 0 or width == 0:
        return b""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    if width >= 64:
        return vals.tobytes()
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def bitunpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of bitpack → uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width >= 64:
        return np.frombuffer(buf, dtype=np.uint64, count=n).copy()
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * width)
    shifts = np.arange(width, dtype=np.uint64)
    out = (bits.reshape(n, width).astype(np.uint64) << shifts).sum(
        axis=1, dtype=np.uint64
    )
    return out


def pack_validity(valid: np.ndarray) -> bytes:
    """Pack a boolean validity mask (True = non-null) to bits."""
    return np.packbits(valid.astype(np.uint8)).tobytes()


def unpack_validity(buf: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n).astype(bool)


def pack_sections(sections: dict[str, bytes]) -> bytes:
    """Serialize named byte sections into one payload blob."""
    parts = [_MAGIC, struct.pack("<BI", _VERSION, len(sections))]
    for name, data in sections.items():
        nb = name.encode("utf-8")
        parts.append(struct.pack("<H", len(nb)))
        parts.append(nb)
        parts.append(struct.pack("<Q", len(data)))
        parts.append(data)
    return b"".join(parts)


def unpack_sections(payload: bytes) -> dict[str, bytes]:
    if payload[:4] != _MAGIC:
        raise ValueError("bad payload magic")
    version, count = struct.unpack_from("<BI", payload, 4)
    if version != _VERSION:
        raise ValueError(f"unsupported payload version {version}")
    off = 9
    out: dict[str, bytes] = {}
    for _ in range(count):
        (nlen,) = struct.unpack_from("<H", payload, off)
        off += 2
        name = payload[off : off + nlen].decode("utf-8")
        off += nlen
        (dlen,) = struct.unpack_from("<Q", payload, off)
        off += 8
        out[name] = payload[off : off + dlen]
        off += dlen
    return out
