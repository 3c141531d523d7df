"""Shared Arrow-batch output construction for mapInPandas kernels.

Every batch kernel in this engine emits its rows through this one
spelling. Building a pandas frame from a list of dicts
(``pd.DataFrame(rows)``) does per-cell type inference — measured at ~2×
of the WHOLE stage cost in the extract kernel at 32 cores — so frames
are assembled per-column instead.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd


def records_to_frame(rows: Sequence[dict], cols: Sequence[str]) -> pd.DataFrame:
    """list-of-dict records → columnar pandas frame (one list per column,
    no per-cell inference, no copy)."""
    data = {c: [r[c] for r in rows] for c in cols}
    return pd.DataFrame(data, columns=list(cols), copy=False)
