"""Per-stage throughput metrics -> run report (north_rule: "per-stage
throughput metrics emitted").

``run_with_report`` consumes a Dataset (to_pandas for small results or
a sink callback), parses ``ds.stats()`` into structured per-operator
metrics (wall seconds, rows, rows/s, UDF time), and writes a JSON run
report next to the output (or a given path)."""

from __future__ import annotations

import json
import os
import re
import time
from typing import Callable, Optional

_OP_RE = re.compile(r"Operator (\d+) (.+?): .*?executed(?:,.*)? in ([\d.]+)s", re.S)
_ROWS_RE = re.compile(r"Output num rows per block: .*?, (\d+) total")
_UDF_RE = re.compile(r"UDF time: .*?, ([\d.]+)(us|ms|s) total")

_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0}


def parse_stats(stats: str) -> list:
    """ds.stats() text -> [{operator, wall_s, rows, rows_per_s, udf_s}]."""
    ops = []
    blocks = re.split(r"\nOperator ", stats)
    for blk in blocks:
        m = re.match(r"(\d+) (.+?): .*?in ([\d.]+)s", blk, re.S)
        if not m:
            continue
        rows_m = _ROWS_RE.search(blk)
        udf_m = _UDF_RE.search(blk)
        wall = float(m.group(3))
        rows = int(rows_m.group(1)) if rows_m else None
        ops.append(
            {
                "operator": m.group(2).strip().split("\n")[0][:100],
                "wall_s": wall,
                "rows": rows,
                "rows_per_s": round(rows / wall, 2) if rows and wall > 0 else None,
                "udf_s": round(float(udf_m.group(1)) * _UNIT[udf_m.group(2)], 3) if udf_m else None,
            }
        )
    return ops


def run_with_report(ds, report_path: str, consume: Optional[Callable] = None, extra: Optional[dict] = None):
    """Execute the dataset, write the per-stage report, return the
    consumed result (default: to_pandas)."""
    t0 = time.perf_counter()
    result = consume(ds) if consume is not None else ds.to_pandas()
    wall = time.perf_counter() - t0
    report = {
        "wall_s": round(wall, 3),
        "stages": parse_stats(ds.stats()),
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(report_path) or ".", exist_ok=True)
    tmp = report_path + ".tmp"
    with open(tmp, "w") as fd:
        json.dump(report, fd, indent=1)
    os.replace(tmp, report_path)
    return result
