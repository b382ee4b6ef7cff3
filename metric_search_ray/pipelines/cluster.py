"""Distribution-quantile clustering over the partitioned index.

Distributed form of the reference's ``clustering`` entry point
(details/tree.cpp:1354-1430): quantile-bucket neighborhoods around an
anchor.  Partitioning assumption (documented per SURVEY.md): the
neighborhood walk runs WITHIN the anchor's (cell, salt) partition tree
— the cell lattice is the level hierarchy above the per-cell trees, so
a cell is the natural neighborhood scope; quantile sizes are taken
against the partition size, exactly like the reference sizes buckets
against its (single) tree size (tree.cpp:1387-1405).

``cluster_all_partitions`` fans the same walk over every partition in
parallel (one task per checkpoint file — embarrassingly parallel, no
shuffle) and returns a (cell, salt, image_id, bucket) Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import cell as cellmod
from ..metrics import PlanarDeg
from . import build as buildmod


def cluster_partition(ckpt_dir: str, cell_id: int, salt: int,
                      distribution, center: tuple[float, float]) -> list[list[str]]:
    """Quantile buckets of image_ids around (lat, lon) center in one
    partition — the direct port of tree.clustering."""
    path = buildmod.part_path(ckpt_dir, cell_id, salt)
    tree, tbl = buildmod.load_partition_tree(path, metric=PlanarDeg())
    rid = tbl.column("row_id").to_numpy()
    raw = tbl.column("image_id").to_numpy(zero_copy_only=False)
    ids = np.empty(len(rid), dtype=object)
    ids[rid] = raw
    buckets = tree._clustering_impl(list(distribution), np.asarray(center, np.float64),
                                    radius=_anchor_radius(tree, center))
    return [[str(ids[i]) for i in b] for b in buckets]


def _anchor_radius(tree, center) -> float:
    # single-anchor case: DBL_MIN like the reference (tree.cpp:1200-1239)
    return 2.2250738585072014e-308


def clustering(ckpt_dir: str, distribution, center: tuple[float, float],
               anchors: list[tuple[float, float]] | None = None) -> list[list[str]]:
    """Reference-shaped entry: validate distribution, compute the anchor
    radius from the anchor point set, locate the anchor's partition,
    walk its tree.  Multi-anchor radius = max dist from the first anchor
    (tree.cpp:1213-1226)."""
    from ..covertree import _is_distribution_ok

    _is_distribution_ok(list(distribution))
    radius = _anchor_radius(None, center)
    if anchors:
        c0 = np.asarray(anchors[0], np.float64)
        radius = max((float(np.sqrt(((np.asarray(a) - c0) ** 2).sum())) for a in anchors[1:]),
                     default=radius)
        center = tuple(c0)
    manifest = buildmod.load_manifest(ckpt_dir)
    by_cell = buildmod.cells_in_manifest(manifest)
    res = int(cellmod.cell_res(manifest.column("cell").to_numpy()[:1])[0])
    lat_u, lon_u = cellmod.latlon_to_units(np.asarray([center[0]]), np.asarray([center[1]]))
    home = int(cellmod.cell_of(lat_u, lon_u, res)[0])
    if home not in by_cell:
        # nearest nonempty cell hosts the anchor (nn across cells)
        cells = np.asarray(sorted(by_cell), np.int64)
        lbs = cellmod.point_cell_min_dist_deg(center[0], center[1], cells)
        home = int(cells[np.argmin(lbs)])
    # anchor partition: the salt whose tree holds the nn of center
    best = None
    for salt, path in by_cell[home]:
        tree, tbl = buildmod.load_partition_tree(path, metric=PlanarDeg())
        _, d = tree.nn(np.asarray(center, np.float64))
        if best is None or d < best[1]:
            best = (salt, d, tree, tbl)
    salt, _, tree, tbl = best
    rid = tbl.column("row_id").to_numpy()
    raw = tbl.column("image_id").to_numpy(zero_copy_only=False)
    ids = np.empty(len(rid), dtype=object)
    ids[rid] = raw
    buckets = tree._clustering_impl(list(distribution), np.asarray(center, np.float64), radius)
    return [[str(ids[i]) for i in b] for b in buckets]


def cluster_all_partitions(ckpt_dir: str, distribution):
    """Run the quantile walk in every partition in parallel (anchor =
    partition tree root).  Returns Dataset (cell, salt, image_id, bucket)."""
    import ray.data as rd

    manifest = buildmod.load_manifest(ckpt_dir)
    parts = rd.from_arrow(manifest.select(["cell", "salt", "path"]))
    dist = list(distribution)

    def one(batch: pa.Table) -> pa.Table:
        out_c, out_s, out_i, out_b = [], [], [], []
        for cell_id, salt, path in zip(batch.column("cell").to_pylist(),
                                       batch.column("salt").to_pylist(),
                                       batch.column("path").to_pylist()):
            tree, tbl = buildmod.load_partition_tree(path, metric=PlanarDeg())
            rid = tbl.column("row_id").to_numpy()
            raw = tbl.column("image_id").to_numpy(zero_copy_only=False)
            ids = np.empty(len(rid), dtype=object)
            ids[rid] = raw
            center = np.asarray(tree.root.data, np.float64)
            buckets = tree._clustering_impl(dist, center,
                                            2.2250738585072014e-308)
            for b, bucket in enumerate(buckets):
                for i in bucket:
                    out_c.append(cell_id)
                    out_s.append(salt)
                    out_i.append(str(ids[i]))
                    out_b.append(b)
        return pa.table({
            "cell": pa.array(out_c, pa.int64()),
            "salt": pa.array(out_s, pa.int64()),
            "image_id": pa.array(out_i, pa.string()),
            "bucket": pa.array(out_b, pa.int64()),
        })

    return parts.map_batches(one, batch_format="pyarrow", batch_size=4)
