"""Storage shim: Lance-first, parquet-fallback (BASELINE.json asks for
Lance tables; ``pylance`` is not installable in this sandbox, so parquet
is the tested interchange and Lance is the same code path behind this
shim when the dependency exists).
"""

from __future__ import annotations

import ray.data as rd


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Read a dataset directory/file: .lance via read_lance when available,
    otherwise parquet.  Always prune columns at the read."""
    if path.endswith(".lance") and _lance_available():
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs):
    if path.endswith(".lance") and _lance_available():
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, **kwargs)
