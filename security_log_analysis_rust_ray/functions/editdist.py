"""Batched Levenshtein distance, vectorized ACROSS PAIRS.

The classic DP has a horizontal dependency (cell j needs cell j-1 of the
same row), which blocks naive vectorization along the string.  The fix is
the min-plus prefix-scan identity: after folding the up/diagonal
candidates into ``tent``, the left-neighbor closure

    row[j] = min_{k <= j} ( tent[k] + (j - k) )

equals ``minimum.accumulate(tent - j) + j`` — one vectorized scan.  So the
kernel loops only over the ROWS of the longer string (O(max_len) Python
iterations), with every row update a numpy op over (n_pairs, len) arrays —
the same loop-over-length/vector-over-batch shape as the BPE and packing
kernels.  Unit costs match DuckDB's ``levenshtein`` (insert/delete/
substitute = 1, codepoint granularity)."""

from __future__ import annotations

import numpy as np


def _encode(strs: list[str], width: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad-encode python strings to a (n, width) uint32 codepoint matrix
    plus lengths.  utf-32-le makes each codepoint one uint32 — no per-char
    Python."""
    n = len(strs)
    out = np.zeros((n, width), dtype=np.uint32)
    lens = np.empty(n, dtype=np.int64)
    for i, s in enumerate(strs):
        c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        lens[i] = len(c)
        out[i, :len(c)] = c
    return out, lens


def levenshtein_pairs(a: list[str], b: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for each (a[i], b[i]) pair; int64 array.

    Memory: two (n_pairs, max_len_b + 1) int32 rows; time O(max_len_a)
    vectorized row updates.  Pairs shorter than the batch max freeze their
    final row once their own string is exhausted (masked update), so mixed
    lengths in one batch stay exact."""
    if not a:
        return np.zeros(0, dtype=np.int64)
    wa = max(len(s) for s in a) or 1
    wb = max(len(s) for s in b) or 1
    A, la = _encode(a, wa)
    B, lb = _encode(b, wb)
    n = len(a)
    ar = np.arange(wb + 1, dtype=np.int32)
    row = np.broadcast_to(ar, (n, wb + 1)).copy()
    for i in range(1, wa + 1):
        active = la >= i
        if not active.any():
            break
        # up/diagonal candidates
        sub = (A[:, i - 1, None] != B).astype(np.int32)  # (n, wb)
        tent = np.empty_like(row)
        tent[:, 0] = i
        tent[:, 1:] = np.minimum(row[:, 1:] + 1, row[:, :-1] + sub)
        # left-neighbor closure via the min-plus prefix scan
        new = np.minimum.accumulate(tent - ar, axis=1) + ar
        row[active] = new[active]
    return row[np.arange(n), lb].astype(np.int64)
