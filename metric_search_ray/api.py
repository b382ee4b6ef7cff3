"""MetricIndex — the user-facing facade mirroring the reference's JS API.

The reference exports one class ``metric_search(metric_enum)`` with
methods insert/insert_if/erase/get/nn/knn/rnn/size/traverse/level_size/
print/print_levels/empty/check_covering/to_vector/to_json/clustering
(n-api/bindings.cpp:33-69, docs n-api/README.md:30-82).  Inputs are
polymorphic scalar | string | vector | matrix with one consistent kind
per index (the MetricWrapper rejects mixed types,
n-api/metric_search_js.hpp:20-178); knn/rnn return
``[{ID, level, data, parent_dist, distance}]``
(n-api/metric_search_js.cpp:194-259).

This facade is the single-process API; the dataset-scale equivalents
(build_index / knn_geo / point_in_polygon_join / ...) live in
``pipelines`` and have no single-node analogue in the reference.
"""

from __future__ import annotations

import numbers

import numpy as np

from . import metrics as metmod
from .covertree import CoverTree

#: mirror of the n-api metric enum (n-api/lib/index.js:2)
METRIC_ENUM = {
    0: "euclidian", 1: "manhatten", 2: "euclidian_thresholded", 3: "cosine",
    4: "p_norm", 5: "emd", 6: "twed", 7: "ssim",
}


def _kind_of(value) -> str:
    if isinstance(value, str):
        return "string"
    if isinstance(value, numbers.Number):
        return "scalar"
    arr = np.asarray(value)
    if arr.ndim <= 1:
        return "vector"
    return "matrix"


class _AutoGridEMD:
    """EMD with the ground-distance grid derived lazily from the first
    record's shape — the facade convenience the reference documents at
    EMD.cpp:1108 ("for images: serialize the T typed matricies in a
    vector and compute the ground distance matrix of the serialized
    grid with ground_distance_matrix_of_2dgrid(cols, rows)").

    Matrix records are serialized column-major (``ravel(order='F')``)
    because the reference grid indexes ``j = c*rows + r``
    (EMD.cpp:79-98); 1-D records get a 1 x n grid.  All records must
    share the first record's shape.
    """

    name = "emd"

    def __init__(self, extra_mass_penalty: float = -1.0):
        self.extra_mass_penalty = extra_mass_penalty
        self._emd = None
        self._shape: tuple | None = None

    def _serialize(self, x) -> np.ndarray:
        arr = np.asarray(x, np.float64)
        shape = arr.shape if arr.ndim == 2 else (1, arr.size)
        if self._emd is None:
            rows, cols = shape
            C = metmod.EMD.ground_distance_matrix_of_2dgrid(cols, rows)
            self._emd = metmod.EMD(C, self.extra_mass_penalty)
            self._shape = shape
        elif shape != self._shape:
            raise ValueError(
                f"EMD record shape {shape} != index grid {self._shape}")
        return arr.ravel(order="F")

    def __call__(self, a, b) -> float:
        A = self._serialize(a)
        B = self._serialize(b)
        return self._emd(A, B)

    def batch(self, q, X) -> np.ndarray:
        return np.asarray([self(q, x) for x in X], np.float64)


class MetricIndex:
    def __init__(self, metric=0, **metric_kwargs):
        """metric: enum int (reference parity), registry name, or a
        callable metric object."""
        if isinstance(metric, int):
            metric = METRIC_ENUM[metric]
        if isinstance(metric, str):
            if metric == "emd":
                # explicit C= keeps full control; without it the
                # facade auto-builds the 2d-grid ground distance from
                # the first record's shape (EMD.cpp:1108 convention)
                if "C" in metric_kwargs:
                    metric = metmod.EMD(**metric_kwargs)
                else:
                    metric = _AutoGridEMD(**metric_kwargs)
            else:
                metric = metmod.registry(**({metric: metric_kwargs} if metric_kwargs else {}))[metric]
        self._tree = CoverTree(metric=metric)
        self._kind: str | None = None

    def _check_kind(self, value):
        k = _kind_of(value)
        if self._kind is None:
            self._kind = k
        elif k != self._kind:
            # MetricWrapper rejects mixed record kinds (metric_search_js.hpp:138-144)
            raise TypeError(f"mixed record kinds: index holds {self._kind}, got {k}")

    # ------------------------------------------------------------ mutation

    def insert(self, value) -> bool:
        # JS value model: a flat number list is ONE vector record
        # (n-api/metric_search_js.cpp:14-61); a list of non-scalars is a
        # batch (reference insert(vector<recType>), tree.cpp:380-388)
        if isinstance(value, (list, tuple)) and value and \
                not isinstance(value[0], numbers.Number):
            return self.insert_many(value)
        if isinstance(value, (list, tuple)) and value and self._kind == "scalar":
            return self.insert_many(value)
        self._check_kind(value)
        return self._tree.insert(value)

    def insert_many(self, values) -> bool:
        for v in values:
            self._check_kind(v)
            self._tree.insert(v)
        return True

    def insert_if(self, value, threshold):
        self._check_kind(value)
        return self._tree.insert_if(value, threshold)

    def erase(self, value) -> bool:
        return self._tree.erase(value)

    # ------------------------------------------------------------ search

    def get(self, ID: int):
        return self._tree[ID]

    @staticmethod
    def _node_dict(node, distance):
        return {"ID": node.ID, "level": node.level, "data": node.data,
                "parent_dist": node.parent_dist, "distance": distance}

    def nn(self, value) -> dict:
        node, d = self._tree.nn(value)
        return self._node_dict(node, d)

    def knn(self, value, k: int = 10) -> list[dict]:
        return [self._node_dict(n, d) for n, d in self._tree.knn(value, k)]

    def rnn(self, value, distance: float = 1.0) -> list[dict]:
        return [self._node_dict(n, d) for n, d in self._tree.rnn(value, distance)]

    # ------------------------------------------------------------ introspection

    def size(self) -> int:
        return self._tree.size()

    def empty(self) -> bool:
        return self._tree.empty()

    def level_size(self) -> int:
        return self._tree.level_size()

    def traverse(self, fn) -> None:
        self._tree.traverse(lambda n: fn(self._node_dict(n, None)))

    def print(self) -> str:
        return self._tree.print_str()

    def print_levels(self) -> dict[int, int]:
        return self._tree.print_levels()

    def check_covering(self) -> bool:
        return self._tree.check_covering()

    def to_vector(self) -> list:
        return self._tree.to_vector()

    def to_json(self, printer=None) -> str:
        return self._tree.to_json(printer)

    def clustering(self, distribution, IDS=None, points=None) -> list[list[int]]:
        return self._tree.clustering(distribution, IDS=IDS, points=points)
