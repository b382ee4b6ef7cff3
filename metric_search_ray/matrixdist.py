"""Pairwise distance matrix — parity with metric::Matrix (details/matrix.cpp).

The reference computes an eager upper-triangular pairwise matrix over a
record vector (matrix.cpp:69-81) and serves (i, j) lookups; its
``append/erase/set`` are declared but never implemented
(matrix.cpp:44-49) and are deliberately not ported.

Engine use: small-side only — brute-force oracles in tests and
per-group cross products inside ``map_groups`` (SURVEY.md §2.7).  The
distributed form emits a long-format (i, j, dist) Dataset per group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DistanceMatrix:
    """Eager symmetric pairwise distances over a record list."""

    def __init__(self, records, metric=None):
        from .metrics import L2
        self.metric = metric if metric is not None else L2()
        self.records = list(records)
        n = len(self.records)
        self._d = np.zeros((n, n))
        batch = getattr(self.metric, "batch", None)
        for i in range(n):
            if batch is not None and n - i - 1 > 0:
                try:
                    row = np.asarray(batch(self.records[i],
                                           np.asarray(self.records[i + 1:])), np.float64)
                    self._d[i, i + 1:] = row
                    self._d[i + 1:, i] = row
                    continue
                except (TypeError, ValueError):
                    pass
            for j in range(i + 1, n):
                d = float(self.metric(self.records[i], self.records[j]))
                self._d[i, j] = self._d[j, i] = d

    def __call__(self, i: int, j: int) -> float:
        return float(self._d[i, j])

    def __getitem__(self, i: int):
        return self.records[i]

    def size(self) -> int:
        return len(self.records)

    def matrix(self) -> np.ndarray:
        return self._d


def pairwise_long(records: np.ndarray, metric, ids=None) -> pa.Table:
    """Long-format (i, j, dist) upper triangle for one small group."""
    m = DistanceMatrix(records, metric)._d
    n = len(m)
    iu, ju = np.triu_indices(n, k=1)
    tbl = {"i": pa.array(iu, pa.int64()), "j": pa.array(ju, pa.int64()),
           "dist": pa.array(m[iu, ju], pa.float64())}
    if ids is not None:
        ids = np.asarray(ids)
        tbl["id_i"] = pa.array(ids[iu])
        tbl["id_j"] = pa.array(ids[ju])
    return pa.table(tbl)


def grouped_pairwise(ds, group_col: str, data_cols: list[str], metric,
                     id_col: str | None = None):
    """Per-group pairwise distances as a Dataset of (group, i, j, dist).

    Cross products are quadratic — this is for SMALL groups (cells,
    candidate buckets), the same restriction the reference's eager
    Matrix has by construction.
    """
    def per_group(tbl: pa.Table) -> pa.Table:
        recs = np.stack([tbl.column(c).to_numpy() for c in data_cols], axis=1)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False) if id_col else None
        out = pairwise_long(recs, metric, ids)
        key = tbl.column(group_col)[0]
        return out.append_column(group_col, pa.array([key.as_py()] * len(out)))

    return ds.groupby(group_col).map_groups(per_group, batch_format="pyarrow")
