"""Shared numpy index-arithmetic kernels used by the vectorized batch
functions (chunking windows, substring fingerprints, packed gathers)."""

from __future__ import annotations

import numpy as np


def excl_cumsum(x: np.ndarray) -> np.ndarray:
    """Exclusive prefix sum as int64: out[i] = sum(x[:i]); out[0] = 0."""
    out = np.zeros(len(x), dtype=np.int64)
    np.cumsum(x[:-1], out=out[1:])
    return out
