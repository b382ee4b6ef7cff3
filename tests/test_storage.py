import numpy as np
import pyarrow as pa

from metric_search_ray import storage


def test_parquet_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    tbl = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                    "b": pa.array(["x", "y", "z"], pa.string())})
    out = str(tmp_path / "t")
    storage.write_table(rd.from_arrow(tbl), out)
    back = storage.read_table(out).to_pandas().sort_values("a").reset_index(drop=True)
    assert list(back["a"]) == [1, 2, 3]
    assert list(back["b"]) == ["x", "y", "z"]
    # column pruning at the read
    only_a = storage.read_table(out, columns=["a"])
    assert only_a.schema().names == ["a"]


def test_lance_falls_back_without_dependency(ray_session, tmp_path):
    # pylance is absent in this environment: .lance paths fall back to parquet
    assert not storage._lance_available()


def test_write_partitioned_resume_skips_completed(ray_session, tmp_path):
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray.pipelines import sink
    rng = np.random.default_rng(6)
    t = pa.table({"day": pa.array(rng.integers(0, 5, 300), pa.int64()),
                  "v": pa.array(np.arange(300), pa.int64())})
    out = str(tmp_path / "sink")
    m1 = sink.write_partitioned(rd.from_arrow(t).repartition(4), out, "day")
    assert m1.num_rows == 5 and not any(m1.column("resumed").to_pylist())
    assert int(np.sum(m1.column("n_rows").to_numpy())) == 300
    # delete one partition file; rerun rewrites ONLY that partition
    victim = m1.column("path")[2].as_py()
    os.remove(victim)
    m2 = sink.write_partitioned(rd.from_arrow(t).repartition(4), out, "day")
    flags = dict(zip(m2.column("path").to_pylist(),
                     m2.column("resumed").to_pylist()))
    assert flags[victim] is False
    assert sum(1 for v in flags.values() if not v) == 1
    # read-back round trip, with partition pruning
    back = sink.read_partitioned(out).to_pandas()
    assert sorted(back["v"]) == list(range(300))
    one = sink.read_partitioned(out, partitions=[3]).to_pandas()
    assert set(one["day"]) == {3}
