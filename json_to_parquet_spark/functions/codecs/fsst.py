"""FSST-style symbol-table text compression (free-code substitution variant).

Like FSST (Boncz, Neumann, Leis: "FSST: Fast Random Access String
Compression", VLDB 2020) this builds a per-chunk table of short byte-string
symbols chosen by frequency*length gain and replaces occurrences with
1-byte codes. Unlike canonical FSST (which uses an escape byte), codes are
drawn ONLY from byte values that do not occur anywhere in the chunk —
common for UTF-8 text where 0xC0-0xC1/0xF5-0xFF and most control bytes are
free. That makes substitution exactly invertible with no escapes, and both
encode and decode run at C speed via bytes.replace on the whole chunk blob.

Symbol discovery is ITERATIVE over a bounded sample (per-chunk work, not
per-row): each round counts n-grams of the current residual, picks the
highest-gain ones, and substitutes them before the next round. Because
later rounds count grams of the *residual*, a later symbol may contain
earlier code bytes — symbols-of-symbols, the same trick canonical FSST
uses to reach effective lengths beyond 8 raw bytes. Decode replays the
substitutions in reverse, which re-expands nested codes correctly.

If the chunk uses too many distinct byte values (e.g. random binary), there
are no free codes and the encoder signals "inapplicable" — the codec
selector then falls back to DICT/PLAIN.
"""

from __future__ import annotations

import numpy as np

_MAX_SAMPLE = 1 << 17      # counting sample per round (128 KiB)
_NGRAM_SIZES = (2, 3, 4, 6, 8)
_TOP_PER_SIZE = 192
_ROUNDS = 5
# Every chosen symbol costs one full-blob replace pass (~1 GB/s/core):
# bound the table to trade encode throughput vs ratio. Measured on
# synthetic web-text blobs: 128 symbols/5 rounds ≈ ratio 1.8-2.6 at
# ~4 MB/s/core encode, 150+ MB/s decode; 250/8 buys ~15% more ratio for
# ~25% less throughput.
_DEFAULT_MAX_SYMBOLS = 128


def _ngram_counts(sample: np.ndarray, size: int) -> list[tuple[bytes, int]]:
    """Top n-grams of `size` bytes in the sample, by count (numpy sliding
    window; no per-byte Python)."""
    if len(sample) < size:
        return []
    windows = np.lib.stride_tricks.sliding_window_view(sample, size)
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


def build_symbol_table(data: bytes, free: list[int],
                       max_symbols: int = _DEFAULT_MAX_SYMBOLS,
                       ) -> tuple[list[bytes], list[int]]:
    """Iterative gain-greedy symbol selection over a bounded sample.

    Returns (symbols, codes) in APPLICATION order — the order matters
    because later symbols may contain earlier codes."""
    max_symbols = min(max_symbols, len(free))
    if max_symbols <= 0 or len(data) < 2:
        return [], []
    residual = data[:_MAX_SAMPLE]
    symbols: list[bytes] = []
    codes: list[int] = []
    per_round = max(8, -(-max_symbols // _ROUNDS))
    for _ in range(_ROUNDS):
        if len(symbols) >= max_symbols or len(residual) < 2:
            break
        sample = np.frombuffer(residual, dtype=np.uint8)
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
        floor = max(8.0, len(residual) / 20000.0)
        picked: list[bytes] = []
        for gram, count in scored:
            if (len(gram) - 1) * count < floor:
                break
            # skip grams contained in a symbol picked this round: their
            # occurrences are about to be consumed by the replace below
            if any(gram in s for s in picked):
                continue
            picked.append(gram)
            if len(picked) >= per_round or \
                    len(symbols) + len(picked) >= max_symbols:
                break
        if not picked:
            break
        # longest-first within the round so supergrams win their overlaps
        picked.sort(key=lambda s: (-len(s), s))
        for gram in picked:
            code = free[len(symbols)]
            symbols.append(gram)
            codes.append(code)
            residual = residual.replace(gram, bytes([code]))
    return symbols, codes


def encode(data: bytes,
           max_symbols: int = _DEFAULT_MAX_SYMBOLS,
           ) -> tuple[bytes, list[bytes], list[int]] | None:
    """Compress the blob. Returns (compressed, symbols, codes) or None when
    inapplicable (no free code bytes / no gain)."""
    free = free_code_bytes(data)
    if len(free) < 4:
        return None
    symbols, codes = build_symbol_table(data, free, max_symbols)
    if not symbols:
        return None
    out = data
    for sym, code in zip(symbols, codes):
        out = out.replace(sym, bytes([code]))
    if len(out) >= len(data):
        return None
    return out, symbols, codes


def decode(compressed: bytes, symbols: list[bytes], codes: list[int]) -> bytes:
    """Exact inverse: replay substitutions in reverse. Valid because each
    code byte never occurs in the original chunk, so every occurrence in
    the stream was produced by its own substitution; nested codes inside
    later symbols are re-expanded by the earlier (later-replayed) steps."""
    out = compressed
    for sym, code in zip(reversed(symbols), reversed(codes)):
        out = out.replace(bytes([code]), sym)
    return out
