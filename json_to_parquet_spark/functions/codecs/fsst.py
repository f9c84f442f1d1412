"""FSST-style symbol-table text compression (free-code substitution variant).

Like FSST (Boncz, Neumann, Leis: "FSST: Fast Random Access String
Compression", VLDB 2020) this builds a per-chunk table of up to ~250 short
byte-string symbols chosen by frequency*length gain and replaces occurrences
with 1-byte codes. Unlike canonical FSST (which uses an escape byte), codes
are drawn ONLY from byte values that do not occur anywhere in the chunk —
common for UTF-8 text where 0xC0-0xC1/0xF5-0xFF and most control bytes are
free. That makes substitution exactly invertible with no escapes, and both
encode and decode run at C speed via bytes.replace on the whole chunk blob.

If the chunk uses too many distinct byte values (e.g. random binary), there
are no free codes and the encoder signals "inapplicable" — the codec
selector then falls back to DICT/PLAIN.

The symbol table is built per column chunk (pure Python over a bounded
sample — per-chunk work, not per-row; see SURVEY.md §2C).
"""

from __future__ import annotations

import numpy as np

_MAX_SYMBOL_LEN = 8
_MAX_SAMPLE = 1 << 20  # 1 MiB sample for symbol discovery
_NGRAM_SIZES = (2, 3, 4, 6, 8)
_TOP_PER_SIZE = 256


def _ngram_counts(sample: np.ndarray, size: int) -> list[tuple[bytes, int]]:
    """Top n-grams of `size` bytes in the sample, by count (numpy sliding window)."""
    if len(sample) < size:
        return []
    windows = np.lib.stride_tricks.sliding_window_view(sample, size)
    # view each window as one fixed-size void scalar so np.unique hashes rows
    as_void = np.ascontiguousarray(windows).view(
        np.dtype((np.void, size))
    ).ravel()
    uniq, counts = np.unique(as_void, return_counts=True)
    if len(uniq) > _TOP_PER_SIZE:
        top = np.argpartition(counts, -_TOP_PER_SIZE)[-_TOP_PER_SIZE:]
        uniq, counts = uniq[top], counts[top]
    return [(u.tobytes(), int(c)) for u, c in zip(uniq, counts)]


def free_code_bytes(data: bytes) -> list[int]:
    """Byte values absent from data (candidate symbol codes)."""
    if not data:
        return list(range(256))
    used = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
    return [i for i in range(256) if used[i] == 0]


def build_symbol_table(data: bytes, max_symbols: int) -> list[bytes]:
    """Pick up to max_symbols frequent substrings (2..8 bytes) by estimated
    gain = (len-1) * count, longest-first tie-broken for deterministic output."""
    if max_symbols <= 0 or len(data) < 2:
        return []
    sample = np.frombuffer(data[:_MAX_SAMPLE], dtype=np.uint8)
    candidates: dict[bytes, int] = {}
    for size in _NGRAM_SIZES:
        for gram, count in _ngram_counts(sample, size):
            if count >= 4:
                candidates[gram] = count
    scored = sorted(
        candidates.items(),
        key=lambda kv: ((len(kv[0]) - 1) * kv[1], len(kv[0]), kv[0]),
        reverse=True,
    )
    symbols: list[bytes] = []
    for gram, count in scored:
        if (len(gram) - 1) * count < 8:
            break
        # skip grams dominated by an already-picked longer symbol: if gram is a
        # substring of a chosen symbol its occurrences are mostly consumed
        if any(gram in s for s in symbols):
            continue
        symbols.append(gram)
        if len(symbols) >= max_symbols:
            break
    # apply longest-first so multi-byte wins before its own substrings
    symbols.sort(key=lambda s: (-len(s), s))
    return symbols


def encode(data: bytes) -> tuple[bytes, list[bytes], list[int]] | None:
    """Compress the blob. Returns (compressed, symbols, codes) or None when
    inapplicable (no free code bytes / no gain)."""
    free = free_code_bytes(data)
    if len(free) < 4:
        return None
    symbols = build_symbol_table(data, min(len(free), 250))
    if not symbols:
        return None
    codes = free[: len(symbols)]
    out = data
    for sym, code in zip(symbols, codes):
        out = out.replace(sym, bytes([code]))
    if len(out) >= len(data):
        return None
    return out, symbols, codes


def decode(compressed: bytes, symbols: list[bytes], codes: list[int]) -> bytes:
    """Exact inverse: replay substitutions in reverse. Valid because each code
    byte never occurs in the original chunk or in any symbol, so every
    occurrence in the stream was produced by its own substitution."""
    out = compressed
    for sym, code in zip(reversed(symbols), reversed(codes)):
        out = out.replace(bytes([code]), sym)
    return out
