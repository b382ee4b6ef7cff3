"""Host parallel-compute ceiling control (NO Ray anywhere).

The scaling criterion compares the same job at N and 4N workers.  On
this sandbox the comparison is bounded above by the HOST, not the
engine: per-core throughput of a pure-CPU numpy kernel drops when 16
cores are busy (frequency scaling / shared memory bandwidth), so even
embarrassingly parallel code cannot reach 1.0.

This script measures that ceiling directly: the identical per-core
kernel (the engine's own DecodeValidate over fixture images, driven
serially in-process) at 4 vs 16 concurrent PROCESSES via
multiprocessing — no Ray scheduler, no object store, no shuffle.
Levels run interleaved (4, 16, 4) to bracket background-load drift.

    ceiling(4->16) = (16 * rate_per_core_at_16) / (4 * rate_per_core_at_4) / 4

Measured 2026-08-18 (this sandbox):
    4 procs : 2266-2575 rows/s/core   (two samples, drift bracket)
    16 procs: 1737 rows/s/core
    ceiling = (16*1737) / (4*~2420) / 4 = ~0.72

Any engine-level 4->16 efficiency should therefore be read relative
to ~0.72, not 1.0.  The 2->8 configuration leaves more headroom
(fewer busy cores at the high level) which is why the primary
criterion runs there.
"""
import sys
import time
import multiprocessing as mp

sys.path.insert(0, "/root/repo")


def work(args):
    path, nrows = args
    import sys as _s
    _s.path.insert(0, "/root/repo")
    import pyarrow.parquet as pq
    from metric_search_ray.stages import decode
    tbl = pq.read_table(path).slice(0, nrows)
    dv = decode.DecodeValidate()
    t0 = time.perf_counter()
    for i in range(0, nrows, 128):
        dv(tbl.slice(i, 128))
    return time.perf_counter() - t0


def main():
    import glob
    files = sorted(glob.glob("/tmp/msr_entry/images_300000/*.parquet")) or \
        sorted(glob.glob(sys.argv[1] + "/*.parquet"))
    path, nrows = files[0], 12000
    rates = {}
    for nproc in (4, 16, 4):
        with mp.Pool(nproc) as p:
            ts = p.map(work, [(path, nrows)] * nproc)
        rate = nrows / max(ts)
        rates.setdefault(nproc, []).append(rate)
        print(f"{nproc:3d} procs: per-core {rate:.0f} rows/s "
              f"(spread {nrows/max(ts):.0f}-{nrows/min(ts):.0f})")
    r4 = sum(rates[4]) / len(rates[4])
    r16 = rates[16][0]
    print(f"ceiling(4->16) = {(16 * r16) / (4 * r4) / 4:.3f}")


if __name__ == "__main__":
    mp.set_start_method("spawn")
    main()
