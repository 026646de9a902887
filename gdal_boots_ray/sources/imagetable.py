"""Image+caption table source — the north star's "Lance table of
10^12 image+caption rows".

Lance and Parquet are both fragment-addressed columnar formats; Ray
Data exposes each as a streaming per-fragment read, so the engine is
format-agnostic: `read_image_table` dispatches to
``ray.data.read_lance`` when the path is a Lance dataset AND the
`lance` package is importable (it is not baked into this sandbox, so
the driver-generated parquet stands in — same schema, same fragment
parallelism), else ``ray.data.read_parquet``.

Column pruning (`columns=[...]`) is passed through either way — a
metadata-only query never pulls image bytes off storage in either
format.  Row filters push down to parquet row groups / lance
fragments alike.
"""

from __future__ import annotations

from typing import List, Optional


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def is_lance_dataset(path: str) -> bool:
    import os

    return path.rstrip("/").endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_image_table(path: str, columns: Optional[List[str]] = None, **kwargs):
    """Dataset over an image+caption table, Lance or Parquet."""
    import ray.data as rd

    if is_lance_dataset(path):
        if not lance_available():
            raise ImportError(
                "path looks like a Lance dataset but the `lance` package is "
                "not installed in this environment; materialize to parquet "
                "or install pylance"
            )
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)
