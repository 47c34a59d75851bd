"""NetCDF time-series ingestion.

Parity: reference ``load_timeseries_netcdf(url_or_path)``
(src/utils/helpers_data_loading.jl:16-33) — download if http(s), read every
1-D-over-time variable into a DataFrame.

Implementation note: netCDF-4 files ARE HDF5 files, so ``h5py`` (available)
reads them without the netCDF4 package; classic (netCDF-3) files are parsed
with ``scipy.io.netcdf_file``. Both paths are gated with clear errors.
"""

from __future__ import annotations

import os
import tempfile
import urllib.request
from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["load_timeseries_netcdf"]


def _download(url: str) -> str:
    fname = os.path.join(tempfile.gettempdir(), os.path.basename(url) or "data.nc")
    if not os.path.exists(fname):
        urllib.request.urlretrieve(url, fname)
    return fname


def _fill_to_nan(arr: np.ndarray, attrs) -> np.ndarray:
    arr = np.asarray(arr)
    if arr.dtype.kind in "fiu":
        arr = arr.astype(np.float64)
        for key in ("_FillValue", "missing_value"):
            if key in attrs:
                fill = np.asarray(attrs[key]).ravel()
                if fill.size:
                    arr = np.where(arr == fill[0], np.nan, arr)
    return arr


def _read_hdf5_backed(path: str) -> Optional[pd.DataFrame]:
    try:
        import h5py
    except ImportError:
        return None
    try:
        f = h5py.File(path, "r")
    except OSError:
        return None  # not an HDF5/netCDF-4 file
    with f:
        # two passes: the record/time dimension is the MOST COMMON 1-D
        # length (same rule as _read_netcdf3) — anchoring to the first
        # dataset visited would latch onto a short auxiliary coord (e.g.
        # an alphabetically-early 'bnds' of length 2) and drop every
        # real time-series variable
        datasets = []

        def collect(name, obj):
            if isinstance(obj, h5py.Dataset) and obj.ndim == 1:
                datasets.append((name, obj))

        f.visititems(collect)
        if not datasets:
            raise ValueError(f"no 1-D variables found in {path}")
        lengths = [d.shape[0] for _, d in datasets]
        n = max(set(lengths), key=lengths.count)
        cols = {}
        for name, obj in datasets:
            if obj.shape[0] == n:
                cols[name.split("/")[-1]] = _fill_to_nan(obj[...], obj.attrs)
        return pd.DataFrame(cols)


def _read_netcdf3(path: str) -> pd.DataFrame:
    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as f:
        # find the record/time dimension: the most common 1-D length
        lengths = [v.shape[0] for v in f.variables.values() if v.data.ndim == 1]
        if not lengths:
            raise ValueError(f"no 1-D variables found in {path}")
        n = max(set(lengths), key=lengths.count)
        cols = {}
        for name, var in f.variables.items():
            if var.data.ndim == 1 and var.shape[0] == n:
                attrs = {
                    k: getattr(var, k)
                    for k in ("_FillValue", "missing_value")
                    if hasattr(var, k)
                }
                cols[name] = _fill_to_nan(var[:].copy(), attrs)
        return pd.DataFrame(cols)


def load_timeseries_netcdf(url_or_path: str) -> pd.DataFrame:
    """Read all 1-D (time-series) variables of a NetCDF file into a
    DataFrame; http(s) URLs are downloaded to a temp file first."""
    path = url_or_path
    if str(url_or_path).startswith(("http://", "https://")):
        path = _download(url_or_path)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    df = _read_hdf5_backed(path)
    if df is not None:
        return df
    return _read_netcdf3(path)
