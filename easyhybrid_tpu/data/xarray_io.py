"""Labeled-array (xarray) ingestion and export.

Parity: the reference's labeled-array dispatch and converters — KeyedArray /
DimArray ``prepare_data`` methods (reference: src/data/prepare_data.jl:3-10,
:21-29) and ``to_keyedArray`` / ``to_dimArray`` / ``toDataFrame`` /
``toNamedTuple`` (src/utils/tools.jl:53-78, :170-381). The Python-ecosystem
analog of AxisKeys/DimensionalData is **xarray**: ``xr.Dataset`` /
``xr.DataArray`` with named dims and coords.

xarray is an optional dependency. Detection is duck-typed
(``.to_dataframe()`` + ``.dims``), so ``prepare_data``/``train`` accept
xarray objects whenever the user's environment provides them, without this
package importing xarray at module scope. Exporters that *construct* xarray
objects (:func:`to_dataset`) import lazily and raise a clear error when
xarray is absent.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

__all__ = [
    "is_xarray_like",
    "xarray_to_dataframe",
    "to_dataset",
    "load_timeseries_xarray",
]


def is_xarray_like(obj) -> bool:
    """True for xr.Dataset / xr.DataArray (or any object speaking their
    minimal interface: ``to_dataframe()`` + named ``dims``). pandas objects
    do not match (no ``to_dataframe``)."""
    return (
        callable(getattr(obj, "to_dataframe", None))
        and hasattr(obj, "dims")
        and not hasattr(obj, "columns")  # excludes DataFrame-likes
    )


def xarray_to_dataframe(obj):
    """Dataset/DataArray → long-format DataFrame: variables as columns,
    every dim (time, site, …) reset into an index column.

    This is the ingestion bridge the reference implements per labeled-array
    type (prepare_data.jl:3-10/:21-29 + tools.jl:170-282): a 1-D-over-time
    dataset becomes the plain timeseries frame; an (time, site) dataset
    becomes long format with a ``site`` column — feed ``split_by_id="site"``
    or :func:`~easyhybrid_tpu.prepare_multisite_data`.
    """
    if hasattr(obj, "data_vars"):  # Dataset
        df = obj.to_dataframe()
    else:  # DataArray — needs a name to become a column
        name = getattr(obj, "name", None) or "value"
        df = obj.to_dataframe(name=name) if obj.name is None else obj.to_dataframe()
    return df.reset_index()


def to_dataset(source, *, which: str = "val", dim: str = "sample"):
    """Export observations + predictions as an ``xr.Dataset``.

    ``source`` may be a DataFrame (columns → variables over ``dim``) or a
    :class:`~easyhybrid_tpu.TrainResults` (obs + pred columns of the chosen
    split merged into one dataset). Parity: the reference's labeled-array
    result converters (tools.jl:53-78). Requires xarray.
    """
    try:
        import xarray as xr
    except ImportError as e:  # pragma: no cover - exercised only w/o xarray
        raise ImportError(
            "to_dataset requires xarray (pip install xarray); "
            "DataFrame results are available without it"
        ) from e

    df = source
    if hasattr(source, "val_obs"):  # TrainResults
        import pandas as pd

        obs = getattr(source, f"{which}_obs")
        pred = getattr(source, f"{which}_pred")
        pred_only = pred[[c for c in pred.columns if c not in obs.columns]]
        df = pd.concat([obs, pred_only], axis=1)
    index_cols = [c for c in ("sample", "step") if c in df.columns]
    if index_cols:
        df = df.set_index(index_cols)
        ds = xr.Dataset.from_dataframe(df)
    else:
        ds = xr.Dataset(
            {c: ((dim,), np.asarray(df[c])) for c in df.columns},
            coords={dim: np.arange(len(df))},
        )
    return ds


def load_timeseries_xarray(url_or_path: str):
    """NetCDF → ``xr.Dataset`` when xarray is installed, otherwise a
    DataFrame via the built-in reader (parity: load_timeseries_netcdf,
    src/utils/helpers_data_loading.jl:16-33 — the xarray form keeps labels).
    """
    try:
        import xarray as xr
    except ImportError:
        from .netcdf import load_timeseries_netcdf

        return load_timeseries_netcdf(url_or_path)
    path = url_or_path
    if str(url_or_path).startswith(("http://", "https://")):
        from .netcdf import _download

        path = _download(url_or_path)
    return xr.open_dataset(path)
