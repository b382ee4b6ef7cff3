"""Windowed aggregate tests with pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from metric_search_ray.pipelines import windows


@pytest.fixture(scope="module")
def events(ray_session):
    rng = np.random.default_rng(4)
    n = 2000
    ts = np.sort(rng.integers(0, 7 * 86400, n)).astype("datetime64[s]")
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n),
        "ts": ts.astype("datetime64[us]"),
        "value": rng.normal(10, 3, n),
    })
    return rd.from_pandas(df), df


def test_tumbling_matches_pandas(events):
    ds, df = events
    got = windows.tumbling(ds, "user_id", "ts", 3600, "value").to_pandas()
    ep = df["ts"].astype("datetime64[s]").astype(np.int64)
    exp = (df.assign(window_start=(ep // 3600) * 3600)
             .groupby(["user_id", "window_start"])
             .agg(n=("value", "size"), sum_value=("value", "sum")).reset_index())
    g = got.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    e = exp.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert len(g) == len(e)
    np.testing.assert_array_equal(g["n"].to_numpy(), e["n"].to_numpy())
    np.testing.assert_allclose(g["sum_value"], e["sum_value"], rtol=1e-9)


def test_sliding_covers_and_counts(events):
    ds, df = events
    size, slide = 7200, 3600
    got = windows.sliding(ds, "user_id", "ts", size, slide, "value").to_pandas()
    ep = df["ts"].astype("datetime64[s]").astype(np.int64)
    # oracle: brute force per (user, window)
    rows = []
    for (u,), sub in df.assign(ep=ep).groupby(["user_id"]):
        starts = np.unique((sub["ep"].to_numpy() // slide) * slide)
        cand = np.unique(np.concatenate([starts, starts - slide]))
        for s in cand:
            m = (sub["ep"] >= s) & (sub["ep"] < s + size)
            if m.any():
                rows.append((u, s, int(m.sum()), float(sub["value"][m].sum())))
    exp = pd.DataFrame(rows, columns=["user_id", "window_start", "n", "sum_value"])
    g = got.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    e = exp.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert len(g) == len(e)
    np.testing.assert_array_equal(g["n"].to_numpy(), e["n"].to_numpy())
    np.testing.assert_allclose(g["sum_value"], e["sum_value"], rtol=1e-9)


def test_sessions_gap_semantics(events):
    ds, df = events
    gap = 1800
    got = windows.sessions(ds, "user_id", "ts", gap, "value").to_pandas()
    # oracle
    total = 0
    for (u,), sub in df.groupby(["user_id"]):
        ep = np.sort(sub["ts"].astype("datetime64[s]").astype(np.int64).to_numpy())
        splits = int((np.diff(ep) > gap).sum()) + 1
        total += splits
        gu = got[got["user_id"] == u]
        assert len(gu) == splits
        assert gu["n"].sum() == len(sub)
        # sessions don't overlap and respect the gap
        gs = gu.sort_values("session_start")
        assert (gs["session_start"].to_numpy()[1:]
                - gs["session_end"].to_numpy()[:-1] > gap).all()
    assert len(got) == total


def test_sliding_validates_args(events):
    ds, _ = events
    with pytest.raises(ValueError):
        windows.sliding(ds, "user_id", "ts", 7000, 3600, "value")


def test_asof_join_ids(ray_session):
    """Backward as-of join: strict/non-strict boundaries, duplicate-ts
    tie-break to the greatest right id, -1 when nothing precedes."""
    import pandas as pd
    import ray.data as rd
    from metric_search_ray.pipelines import windows

    base = np.datetime64("2025-06-01T00:00:00", "s").astype("datetime64[us]")
    sec = np.timedelta64(1_000_000, "us")
    left = pd.DataFrame({
        "lid": np.arange(4, dtype=np.int64),
        "k": np.asarray([1, 1, 1, 2], np.int64),
        "ts": [base + 5 * sec, base + 10 * sec, base + 20 * sec, base + 9 * sec],
    })
    right = pd.DataFrame({
        "rid": np.asarray([100, 101, 102, 103], np.int64),
        "k": np.asarray([1, 1, 1, 1], np.int64),
        # two right rows share ts=10s: tie must resolve to rid 102
        "ts": [base + 10 * sec, base + 2 * sec, base + 10 * sec, base + 30 * sec],
    })
    out = windows.asof_join_ids(
        rd.from_pandas(left.rename(columns={"k": "user_id"})),
        rd.from_pandas(right.rename(columns={"k": "user_id"})),
        "user_id", "ts", "lid", "rid").to_pandas().set_index("lid")
    assert out.loc[0, "asof_rid"] == 101          # only 2s precedes 5s
    assert out.loc[1, "asof_rid"] == 101          # strict: 10s excluded
    assert out.loc[2, "asof_rid"] == 102          # tie at 10s -> max rid
    assert out.loc[3, "asof_rid"] == -1           # key 2 has no right rows
    out2 = windows.asof_join_ids(
        rd.from_pandas(left.rename(columns={"k": "user_id"})),
        rd.from_pandas(right.rename(columns={"k": "user_id"})),
        "user_id", "ts", "lid", "rid", strict=False).to_pandas().set_index("lid")
    assert out2.loc[1, "asof_rid"] == 102         # non-strict includes 10s


def test_funnel_strict_order_and_partial(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray.pipelines import windows
    us = 1_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),
        "ts": pa.array(np.array([10, 20, 30, 40, 50, 5, 7]) * us,
                       pa.timestamp("us")),
        "event_type": pa.array(["view", "click", "purchase",
                                "click", "view",   # click BEFORE view: unmatched
                                "purchase",        # never viewed
                                "view"]),
    })
    out = (windows.funnel(rd.from_arrow(t), "user_id", "ts", "event_type",
                          ["view", "click", "purchase"]).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == [1, 2, 4]      # user 3 never starts
    assert out["steps_completed"].tolist() == [3, 1, 1]
    assert out.loc[0, ["ts_1", "ts_2", "ts_3"]].tolist() == [
        10 * us, 20 * us, 30 * us]
    assert out.loc[1, ["ts_1", "ts_2"]].tolist() == [50 * us, -1]


def test_tumbling_merge_update_incremental_equals_full(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from metric_search_ray.pipelines import sink, windows
    us = 1_000_000

    def ev(ids, ts_s, vals):
        return pa.table({
            "user_id": pa.array(ids, pa.int64()),
            "ts": pa.array(np.asarray(ts_s) * us, pa.timestamp("us")),
            "value": pa.array(np.asarray(vals, np.float64)),
        })

    rng = np.random.default_rng(9)
    # initial load: days 0-2; incremental: day 2 (overlap) + day 5 (new)
    t1 = ev(rng.integers(0, 4, 200), rng.integers(0, 3 * 86400, 200),
            rng.integers(0, 10, 200))
    t2 = ev(rng.integers(0, 4, 100),
            np.concatenate([rng.integers(2 * 86400, 3 * 86400, 50),
                            rng.integers(5 * 86400, 6 * 86400, 50)]),
            rng.integers(0, 10, 100))
    ck = str(tmp_path / "aggckpt")
    windows.tumbling_checkpointed(rd.from_arrow(t1), ck, "user_id", "ts",
                                  3600, "value")
    m = windows.tumbling_merge_update(rd.from_arrow(t2), ck, "user_id", "ts",
                                      3600, "value")
    # result must equal a from-scratch aggregate over t1+t2
    got = (sink.read_partitioned(ck).to_pandas()
           .sort_values(["user_id", "window_start"]).reset_index(drop=True))
    full = (windows.tumbling(rd.from_arrow(pa.concat_tables([t1, t2])),
                             "user_id", "ts", 3600, "value").to_pandas()
            .sort_values(["user_id", "window_start"]).reset_index(drop=True))
    assert got["n"].tolist() == full["n"].tolist()
    assert got["sum_value"].tolist() == full["sum_value"].tolist()
    assert got["window_start"].tolist() == full["window_start"].tolist()
    # untouched day-0/1 partitions were NOT rewritten (resumed in manifest
    # of the update is irrelevant; check files: day 0 partition mtime
    # predates the update is hard to assert portably — assert manifest
    # completeness instead)
    parts = set(m.column("partition").to_pylist())
    assert {"0", "86400", "172800", "432000"} <= parts


# ---------------------------------------------------------------- skew +
# crash-resume regressions (round 3)

@pytest.fixture(scope="module")
def skewed_events(ray_session):
    """One hot key holds ~90% of all events (the 'city' key)."""
    rng = np.random.default_rng(11)
    n = 5000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 10, n))
    ts = np.sort(rng.integers(0, 3 * 86400, n)).astype("datetime64[s]")
    df = pd.DataFrame({
        "user_id": keys.astype(np.int64),
        "ts": ts.astype("datetime64[us]"),
        "value": rng.normal(5, 2, n),
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": rng.choice(["view", "cart", "purchase"], n,
                                 p=[0.6, 0.3, 0.1]),
    })
    # many small blocks so the hot key spans block boundaries
    return rd.from_pandas(df).repartition(16), df


def _sessions_oracle(df, gap):
    rows = []
    for k, g in df.sort_values("ts").groupby("user_id"):
        ep = g["ts"].astype("datetime64[s]").astype(np.int64).to_numpy()
        v = g["value"].to_numpy()
        new = np.concatenate([[True], np.diff(ep) > gap])
        st = np.flatnonzero(new)
        en = np.concatenate([st[1:], [len(ep)]])
        for a, b in zip(st, en):
            rows.append((k, ep[a], ep[b - 1], b - a, v[a:b].sum()))
    return pd.DataFrame(rows, columns=["user_id", "session_start",
                                       "session_end", "n", "sum_value"])


def test_sessions_skewed_key(skewed_events):
    ds, df = skewed_events
    got = (windows.sessions(ds, "user_id", "ts", 600, "value").to_pandas()
           .sort_values(["user_id", "session_start"]).reset_index(drop=True))
    exp = (_sessions_oracle(df, 600)
           .sort_values(["user_id", "session_start"]).reset_index(drop=True))
    assert len(got) == len(exp)
    for c in ("user_id", "session_start", "session_end", "n"):
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())
    np.testing.assert_allclose(got["sum_value"], exp["sum_value"], rtol=1e-9)


def test_asof_skewed_key(skewed_events):
    ds, df = skewed_events
    purchases = ds.filter(lambda r: r["event_type"] == "purchase")
    got = (windows.asof_join_ids(ds, purchases, "user_id", "ts",
                                 "event_id", "event_id").to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # brute-force oracle
    rdf = df[df["event_type"] == "purchase"]
    exp_id = np.full(len(df), -1, np.int64)
    ep = df["ts"].astype("datetime64[s]").astype(np.int64).to_numpy()
    for k, g in rdf.groupby("user_id"):
        rep = g["ts"].astype("datetime64[s]").astype(np.int64).to_numpy()
        rid = g["event_id"].to_numpy()
        order = np.lexsort((rid, rep))
        rep, rid = rep[order], rid[order]
        mask = (df["user_id"] == k).to_numpy()
        pos = np.searchsorted(rep, ep[mask], side="left") - 1
        hit = pos >= 0
        exp_id[mask] = np.where(hit, rid[np.maximum(pos, 0)], -1)
    exp = pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                        "asof_event_id": exp_id}).sort_values(
        "event_id").reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["asof_event_id"].to_numpy(),
                                  exp["asof_event_id"].to_numpy())


def test_funnel_skewed_key(skewed_events):
    ds, df = skewed_events
    steps = ["view", "cart", "purchase"]
    got = (windows.funnel(ds, "user_id", "ts", "event_type", steps)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # brute-force chain oracle
    rows = []
    epu = df["ts"].astype("datetime64[us]").astype(np.int64)
    for k, g in df.assign(epu=epu).groupby("user_id"):
        cur, done, out = -1, 0, [-1, -1, -1]
        for i, s in enumerate(steps):
            eps = np.sort(g.loc[g["event_type"] == s, "epu"].to_numpy())
            pos = np.searchsorted(eps, cur, side="right")
            if pos >= len(eps):
                break
            cur = int(eps[pos]); out[i] = cur; done += 1
        if done:
            rows.append((k, done, *out))
    exp = pd.DataFrame(rows, columns=["user_id", "steps_completed",
                                      "ts_1", "ts_2", "ts_3"]).sort_values(
        "user_id").reset_index(drop=True)
    assert len(got) == len(exp)
    for c in exp.columns:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())


def test_merge_update_crash_safety(ray_session, tmp_path):
    """Crash-resume contract: old files survive until the new manifest
    is installed; missing manifest-listed files fail loudly; orphans
    from a crashed merge are swept."""
    import os
    from metric_search_ray.pipelines import sink

    rng = np.random.default_rng(3)
    def mk(n, t0):
        ts = (t0 + np.sort(rng.integers(0, 2 * 86400, n))).astype(
            "datetime64[s]")
        return pd.DataFrame({"user_id": rng.integers(0, 5, n),
                             "ts": ts.astype("datetime64[us]"),
                             "value": np.ones(n)})
    d = str(tmp_path / "agg")
    base, delta = mk(500, 0), mk(300, 86400)
    windows.tumbling_checkpointed(rd.from_pandas(base), d, "user_id",
                                  "ts", 3600, "value")
    manifest0 = {r["partition"]: r["path"] for r in
                 pd.read_parquet(os.path.join(d, "manifest.parquet"))
                 .to_dict("records")}
    # plant an orphan file (simulates a crash between write and manifest
    # swap of an earlier merge)
    orphan = os.path.join(d, "part-99999-mdeadbeef.parquet")
    import pyarrow.parquet as pq_
    pq_.write_table(pa.table({"x": [1]}), orphan)
    windows.tumbling_merge_update(rd.from_pandas(delta), d, "user_id",
                                  "ts", 3600, "value")
    assert not os.path.exists(orphan), "orphan sweep failed"
    # merged result equals from-scratch
    both = pd.concat([base, delta])
    full = windows.tumbling(rd.from_pandas(both), "user_id", "ts", 3600,
                            "value").to_pandas()
    merged = sink.read_partitioned(d).to_pandas()
    g = merged.groupby(["user_id", "window_start"]).agg(
        n=("n", "sum")).reset_index().sort_values(
        ["user_id", "window_start"]).reset_index(drop=True)
    e = full.sort_values(["user_id", "window_start"]).reset_index(
        drop=True)[["user_id", "window_start", "n"]]
    np.testing.assert_array_equal(g["n"].to_numpy(), e["n"].to_numpy())
    # corruption (manifest-listed file missing for a TOUCHED partition)
    # fails loudly instead of silently merging delta-only
    man = pd.read_parquet(os.path.join(d, "manifest.parquet"))
    victim = man.loc[man["partition"] == "86400", "path"].iloc[0]
    os.remove(victim)
    with pytest.raises(FileNotFoundError):
        windows.tumbling_merge_update(rd.from_pandas(delta), d, "user_id",
                                      "ts", 3600, "value")
