"""Local replay of the driver's correctness gate at sf0.01.

For every key in __ray_entry__.queries():
  - run the Ray query(sf_dir)
  - run oracle_sql()[key] in DuckDB with the ten tables registered as views
  - compare row count, schema (column names), and a value hash computed
    the driver's way: sort columns by name, sort rows by all columns,
    round floats, hash the repr.
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd
import numpy as np
import ray

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.copy()
    # normalize: sort columns by name
    df = df[sorted(df.columns)]
    # canonical value forms
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except Exception:
        df = df.iloc[np.lexsort([df[c].astype(str).to_numpy() for c in reversed(df.columns)])].reset_index(drop=True)
    h = hashlib.md5()
    for c in df.columns:
        h.update(c.encode())
        h.update(df[c].astype(str).str.cat(sep="\x1f").encode())
    return len(df), list(df.columns), h.hexdigest()


def to_pandas(res):
    import pyarrow as pa
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    raise TypeError(type(res))


def main():
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import importlib.util
    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["entry"] = m
    spec.loader.exec_module(m)
    qs, osql = m.queries(), m.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results = {}
    keys = [k for k in qs if (ONLY is None or k in ONLY)]
    for k in keys:
        try:
            rdf = to_pandas(qs[k](SF_DIR))
            odf = con.execute(osql[k]).df()
            rn, rcols, rh = canon(rdf)
            on, ocols, oh = canon(odf)
            rec = {"rows": rn == on, "schema": rcols == ocols, "hash": rh == oh,
                   "ray_rows": rn, "oracle_rows": on}
            if not rec["schema"]:
                rec["ray_cols"] = rcols
                rec["oracle_cols"] = ocols
            results[k] = rec
            status = "OK " if all([rec["rows"], rec["schema"], rec["hash"]]) else "FAIL"
            print(f"{status} {k}: ray={rn} oracle={on} hash={'=' if rh==oh else '!'}", flush=True)
        except Exception as e:
            results[k] = {"err": f"{type(e).__name__}: {e}"}
            print(f"ERR  {k}: {type(e).__name__}: {str(e)[:200]}", flush=True)

    bad = {k: v for k, v in results.items()
           if v.get("err") or not (v.get("rows") and v.get("schema") and v.get("hash"))}
    print(f"\n{len(results)-len(bad)}/{len(results)} green")
    if bad:
        print(json.dumps(bad, indent=2, default=str))
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
