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
