"""Cluster job entrypoint: the flagship pipeline as one submittable run.

The north rule launches the engine with ``ray job submit`` on a
fixed-size cluster; this module is that entrypoint::

    ray job submit -- python -m metric_search_ray.job \
        --input  /data/images        \
        --ckpt   /data/geoidx        \
        --output /data/out           \
        --queries /data/queries.parquet

Run standalone (``python -m metric_search_ray.job ...``) it starts a
local Ray session; under ``ray job submit`` it attaches to the cluster
the job runner already provides (``ray.init()`` with no address inside
a job connects to the running cluster).  Stages:

1. read the image table (Lance or parquet via storage.read_table),
   decode+validate every row (PSNR gate, phash recompute);
2. build / resume the partitioned cover-tree geo index (checkpointed,
   per-partition lineage manifest — a rerun skips finished partitions);
3. answer the query table: exact geo kNN + point-in-polygon join +
   per-tile counts, each written as partitioned parquet under
   ``--output``;
4. write ``metrics.json`` (row counts, stage wall-clock, manifest
   digest) for the run's lineage record.

Everything streams: no full-table driver materialization anywhere.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True, help="image table (parquet/lance dir)")
    p.add_argument("--ckpt", required=True, help="index checkpoint dir (resumable)")
    p.add_argument("--output", required=True, help="output dir for result tables")
    p.add_argument("--queries", default=None,
                   help="query table (query_id, lat, lon, k); defaults to the "
                        "F3 fixture mix for smoke runs")
    p.add_argument("--res", type=int, default=6, help="geo cell resolution")
    p.add_argument("--tile-res", type=int, default=6, help="raster tile resolution")
    p.add_argument("--target-rows", type=int, default=50_000,
                   help="max rows per index partition (salting threshold)")
    p.add_argument("--knn-concurrency", type=int, default=8)
    p.add_argument("--skip-validate", action="store_true")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)
    import pyarrow as pa
    import ray.data as rd

    from . import fixtures, storage
    from .pipelines import build, joins, knn, tiles
    from .stages import assign, decode

    os.makedirs(args.output, exist_ok=True)
    metrics: dict = {"stages": {}}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        metrics["stages"][name] = round(time.perf_counter() - t0, 3)
        return out

    # 1. validate (streaming; counts only reach the driver)
    images = storage.read_table(args.input)
    if not args.skip_validate:
        n_bad = timed("validate", lambda: (
            images.map_batches(decode.DecodeValidate, batch_format="pyarrow",
                               batch_size=256, concurrency=args.knn_concurrency)
            .filter(lambda r: not r["valid"]).count()))
        metrics["invalid_rows"] = int(n_bad)

    # 2. index build / resume (narrow columns only enter the shuffle)
    manifest = timed("build_index", lambda: build.build_index(
        storage.read_table(args.input, columns=["image_id", "phash"]),
        args.ckpt, res=args.res, target_rows=args.target_rows, resume=True))
    metrics["index_partitions"] = manifest.num_rows
    metrics["index_rows"] = int(sum(manifest.column("n_rows").to_pylist()))
    metrics["resumed_partitions"] = int(sum(manifest.column("resumed").to_pylist()))

    # 3a. kNN over the query table
    if args.queries:
        qds = storage.read_table(args.queries)
    else:
        qds = rd.from_arrow(pa.table(fixtures.knn_queries(200)))
    timed("knn", lambda: knn.knn_geo(
        qds, args.ckpt, concurrency=args.knn_concurrency
    ).write_parquet(os.path.join(args.output, "knn")))

    # 3b. point-in-polygon join + per-tile counts over the geotagged rows
    pts = (storage.read_table(args.input, columns=["image_id"])
           .map_batches(assign.geotag, batch_format="pyarrow"))
    layer = fixtures.polygon_layer()
    timed("pip", lambda: joins.point_in_polygon_join(
        pts, layer, how="inner", concurrency=args.knn_concurrency
    ).write_parquet(os.path.join(args.output, "pip")))
    timed("tiles", lambda: tiles.tiles_with_images(
        pts, args.tile_res).write_parquet(os.path.join(args.output, "tiles")))

    metrics["total_sec"] = round(sum(metrics["stages"].values()), 3)
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
