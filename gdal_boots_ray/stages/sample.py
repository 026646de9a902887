"""Deterministic sampling stages for training-data pipelines.

A 100 TB corpus job cannot use ``Dataset.random_sample``: a retry or
a resumed partition would redraw and the output would not be
replayable.  These stages decide membership from a cryptographic hash
of the row's stable id, so the SAME rows are kept on every run, on
every cluster size, and after any mid-run failure — and the decision
is replayable in SQL (DuckDB ``md5``) for the oracle gate.

The hash is the first 8 hex chars of md5(str(id)) taken as an
integer mod 10_000 (0.01% rate resolution), compared against
``rate * 10_000``.  No shuffle, no state: a pure ``map_batches``
filter that composes with any downstream stage.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

import numpy as np
import pyarrow as pa

_MOD = 10_000


def _hash_fraction(ids) -> np.ndarray:
    """md5-based uniform draw in [0, _MOD) per id — replayable as
    DuckDB: CAST('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8)
    AS UBIGINT) % 10000."""
    return np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % _MOD for i in ids],
        dtype=np.int64,
    )


def deterministic_sample(ds, id_col: str, rate: float):
    """Keep each row iff hash(id) falls under ``rate`` — identical
    output for any partitioning, retry, or resume."""
    thresh = int(round(rate * _MOD))

    def keep(batch: pa.Table) -> pa.Table:
        frac = _hash_fraction(batch.column(id_col).to_pylist())
        return batch.filter(pa.array(frac < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    id_col: str,
    strata_col: str,
    rates: Dict[str, float],
    default_rate: float = 0.0,
):
    """Per-stratum deterministic sampling (e.g. downsample 'en' to
    10%, keep low-resource languages at 100%) — the class-balance
    step of a corpus pipeline, as a stateless vectorized filter."""
    thresh_by = {k: int(round(v * _MOD)) for k, v in rates.items()}
    default_thresh = int(round(default_rate * _MOD))

    def keep(batch: pa.Table) -> pa.Table:
        frac = _hash_fraction(batch.column(id_col).to_pylist())
        strata = batch.column(strata_col).to_pylist()
        thr = np.array([thresh_by.get(s, default_thresh) for s in strata], dtype=np.int64)
        return batch.filter(pa.array(frac < thr))

    return ds.map_batches(keep, batch_format="pyarrow")
