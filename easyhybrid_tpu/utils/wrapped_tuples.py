"""WrappedTuples: list-of-records with field-vector dot access.

Parity: reference ``WrappedTuples`` (src/utils/wrap_tuples.jl:8-45) — wraps a
list of dicts (or dataclass-like records) so ``wt.field`` returns the vector
of that field across records, plus a matrix conversion for plotting.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

__all__ = ["WrappedTuples"]


class WrappedTuples:
    def __init__(self, records: Sequence[Any]):
        self._records = list(records)

    def _field(self, name: str):
        out = []
        for r in self._records:
            if isinstance(r, dict):
                out.append(r[name])
            else:
                out.append(getattr(r, name))
        return out

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        try:
            return self._field(name)
        except (KeyError, AttributeError):
            raise AttributeError(name) from None

    def __getitem__(self, i):
        return self._records[i]

    def __len__(self):
        return len(self._records)

    def __iter__(self):
        return iter(self._records)

    @property
    def fields(self):
        first = self._records[0]
        if isinstance(first, dict):
            return list(first.keys())
        return [k for k in vars(first)]

    def to_matrix(self) -> np.ndarray:
        """(n_records, n_fields) float matrix of scalar fields."""
        cols = []
        for f in self.fields:
            try:
                cols.append([float(v) for v in self._field(f)])
            except (TypeError, ValueError):
                continue
        return np.asarray(cols, np.float64).T

    def __repr__(self):
        return f"WrappedTuples({len(self)} records, fields={self.fields})"
