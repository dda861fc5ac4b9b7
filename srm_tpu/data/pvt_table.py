"""Bundled PVT experimental table (spline knots for the PVT layer).

The reference ships a pickled DataFrame ``pvt_data.df`` (37 pressure points x
[Pre, InvBg, InvBo, Invug, Invuo, Rs, Rv, InvBgd, Invugd, Vro]; see SURVEY
§2.3 #26). The same numeric table ships here as a CSV asset so the framework
is standalone and pickle-free.
"""

from __future__ import annotations

import csv
import os
from functools import lru_cache
from typing import Dict

import numpy as np

ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets", "pvt_table.csv")


@lru_cache(maxsize=1)
def load_pvt_table(path: str = ASSET) -> Dict[str, np.ndarray]:
    """Column-name (lowercased) → float32 vector."""
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = [[float(v) for v in r] for r in reader if r]
    arr = np.asarray(rows, dtype=np.float32)
    return {h.lower(): arr[:, i] for i, h in enumerate(header)}


def load_pvt_table_summary():
    """The table wrapped in a DataSummary so that ``lookup('pre')`` /
    ``lookup('invbg')`` return knot vectors (as the reference's
    ``load_spline_data`` does via DataSummary over the dataframe)."""
    import pandas as pd
    from srm_tpu.utils.stats import DataSummary
    cols = load_pvt_table()
    df = pd.DataFrame({k: v for k, v in cols.items()})
    return DataSummary([df])
