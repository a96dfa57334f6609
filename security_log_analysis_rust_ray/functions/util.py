"""Small shared numeric helpers."""

from __future__ import annotations

import numpy as np


def round_half_up(x: np.ndarray | float, ndigits: int = 6) -> np.ndarray:
    """Round half away from zero (DuckDB's ROUND), not numpy's half-even —
    keeps oracle float comparisons exact at rounding boundaries."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
