"""metric_search_ray — a Ray-Data-native spatial-join + tiling + kNN engine.

From-scratch reimplementation of the capabilities of
``SignalEmpoweringTechnology/metric_search`` (a header-only C++ cover-tree
metric-search library, studied read-only at /root/reference) as a
partition-parallel Ray Data engine over image+caption tables:

- hierarchical quadkey geo cells (``cell``) replace the cover tree's
  ``covdist = base^level`` geometry at the partitioning layer
  (reference: details/tree.cpp:197-206);
- a faithful per-partition cover tree (``covertree``) keeps the reference's
  covering invariant, nearest-ancestor insertion, root promotion, exact
  nn/knn/rnn and quantile clustering (reference: details/tree.cpp);
- a pluggable vectorized metric registry (``metrics``) mirrors the
  n-api metric enum (reference: n-api/lib/index.js:2) plus the Hamming
  metric over 64-bit perceptual hashes required by the target rule;
- Ray Data pipelines (``pipelines``) run everything as
  ``Dataset.map_batches`` over zero-copy Arrow batches with actor pools
  for stateful stages, groupby shuffles with explicit skew salting, and
  per-partition parquet checkpoints for resumability.

No code is copied from the reference; all citations are file:line pointers
for semantic parity checks.
"""

from . import (  # noqa: F401
    cell,
    codecs,
    geocode,
    geodesic,
    geom,
    graph,
    jpegcodec,
    metrics,
    phash,
    pipelines,
    pngcodec,
    stages,
)
from .covertree import CoverTree  # noqa: F401

__version__ = "0.1.0"


def use_hash_shuffle() -> None:
    """Switch Ray Data's shuffle strategy to HASH_SHUFFLE (idempotent).

    The engine's query routing uses ``repartition(keys=...)`` (a hash
    exchange with no sort barrier), which Ray only plans under this
    strategy; it also removes the sort step from groupby exchanges.
    Called by the pipelines that need it (knn.knn_geo); safe to call
    once per session from any entry point."""
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
