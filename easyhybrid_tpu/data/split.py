"""Train/validation splitting.

Parity with the reference's ``split_data`` (reference:
src/data/split_data.jl:8-184) and ``prepare_splits`` (src/data/splits.jl:3-30):
three modes — by-ID grouping, external k-fold assignment + ``val_fold``,
and random/chronological fraction split — plus optional sequence windowing
before the split and pre-split tuple pass-through.
"""

from __future__ import annotations

import logging
from typing import Mapping, Optional, Sequence, Tuple, Union

import numpy as np

from .prepare import HybridData, _is_dataframe, prepare_data
from .sequences import filter_sequences, split_into_sequences

__all__ = ["split_data", "prepare_splits", "train_val_indices"]

log = logging.getLogger("easyhybrid_tpu")


def train_val_indices(
    n: int,
    *,
    at: float = 0.8,
    shuffle: bool = False,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fraction split of ``range(n)``; chronological unless ``shuffle``."""
    idx = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(idx)
    n_train = int(round(n * at))
    return idx[:n_train], idx[n_train:]


def _column_vector(data, name):
    if _is_dataframe(data):
        return np.asarray(data[name])
    if isinstance(data, Mapping):
        return np.asarray(data[name])
    raise TypeError(
        f"cannot look up column {name!r} in {type(data).__name__}; pass the "
        "id/fold assignments as an array instead"
    )


def split_data(
    data,
    model,
    *,
    split_by_id: Union[None, str, Sequence] = None,
    folds: Union[None, str, Sequence] = None,
    val_fold: Optional[int] = None,
    shuffleobs: bool = False,
    split_data_at: float = 0.8,
    sequence_kwargs: Optional[dict] = None,
    seed: Optional[int] = None,
) -> Tuple[HybridData, HybridData]:
    """Prepare ``data`` for ``model`` and split into (train, val).

    Pre-split input: pass ``(train_HybridData, val_HybridData)`` straight
    through (parity: split_data.jl:3-6).
    """
    if (
        isinstance(data, tuple)
        and len(data) == 2
        and all(isinstance(d, HybridData) for d in data)
    ):
        log.warning(
            "data was prepared already; split_data keyword arguments ignored"
        )
        return data

    from .xarray_io import is_xarray_like, xarray_to_dataframe

    if is_xarray_like(data):
        # convert once up front so id-column lookups see the same frame
        data = xarray_to_dataframe(data)

    prepared, keep = prepare_data(
        model, data, drop_missing_rows=(sequence_kwargs is None), return_keep=True
    )

    if sequence_kwargs is not None:
        defaults = dict(input_window=10, output_window=1, output_shift=1, lead_time=1)
        sk = {**defaults, **sequence_kwargs}
        log.info("Using split_into_sequences: %s", sk)
        prepared = split_into_sequences(prepared, **sk)
        prepared = filter_sequences(prepared)

    n = prepared.n_samples

    if split_by_id is not None and folds is not None:
        raise ValueError(
            "split_by_id and folds are not supported together; do the split "
            "when constructing folds"
        )

    if split_by_id is not None:
        ids = (
            _column_vector(data, split_by_id)
            if isinstance(split_by_id, str)
            else np.asarray(split_by_id)
        )
        if sequence_kwargs is not None:
            raise ValueError("split_by_id with sequence windows is not supported")
        if keep is not None and len(ids) == len(keep) and len(ids) != n:
            ids = ids[keep]  # align with rows surviving the NaN filter
        if len(ids) != n:
            raise ValueError(
                f"id vector length {len(ids)} != prepared sample count {n}; "
                "pass pre-filtered data or the ids of kept rows"
            )
        unique_ids = list(dict.fromkeys(ids.tolist()))
        tr_u, va_u = train_val_indices(
            len(unique_ids), at=split_data_at, shuffle=shuffleobs, seed=seed
        )
        train_ids = {unique_ids[i] for i in tr_u}
        val_ids = {unique_ids[i] for i in va_u}
        # dtype pinned: np.array([]) defaults to float64, which take()
        # rejects when a partition is empty (e.g. 2 ids at 0.8)
        train_idx = np.array(
            [i for i, v in enumerate(ids) if v in train_ids], dtype=np.intp
        )
        val_idx = np.array(
            [i for i, v in enumerate(ids) if v in val_ids], dtype=np.intp
        )
        log.info(
            "Splitting by id: %d unique | train ids %d | val ids %d",
            len(unique_ids),
            len(train_ids),
            len(val_ids),
        )
        return prepared.take(train_idx), prepared.take(val_idx)

    if folds is not None or val_fold is not None:
        if folds is None or val_fold is None:
            raise ValueError("provide both folds and val_fold for k-fold splits")
        if shuffleobs:
            log.warning(
                "shuffleobs is ignored with folds/val_fold; shuffle at fold "
                "construction instead"
            )
        f = (
            _column_vector(data, folds)
            if isinstance(folds, str)
            else np.asarray(folds)
        )
        if keep is not None and len(f) == len(keep) and len(f) != n:
            f = f[keep]  # align with rows surviving the NaN filter
        if len(f) != n:
            raise ValueError(
                f"length(folds) ({len(f)}) must equal number of samples ({n})"
            )
        if not (1 <= val_fold <= int(f.max())):
            raise ValueError(f"val_fold={val_fold} out of range 1:{int(f.max())}")
        val_idx = np.nonzero(f == val_fold)[0]
        if len(val_idx) == 0:
            raise ValueError(f"no samples assigned to validation fold {val_fold}")
        train_idx = np.nonzero(f != val_fold)[0]
        log.info(
            "K-fold split: val_fold=%d -> train=%d val=%d",
            val_fold,
            len(train_idx),
            len(val_idx),
        )
        return prepared.take(train_idx), prepared.take(val_idx)

    train_idx, val_idx = train_val_indices(
        n, at=split_data_at, shuffle=shuffleobs, seed=seed
    )
    return prepared.take(train_idx), prepared.take(val_idx)


def merged_sequence_kwargs(data_config) -> Optional[dict]:
    """The ONE windowing-defaults policy for every entry point: copy
    ``sequence_kwargs`` and ``setdefault`` ``input_window=sequence_length``.
    Used by ``prepare_splits``, ``train`` and ``train_second_order`` so the
    same DataConfig windows identically everywhere."""
    if not (
        getattr(data_config, "sequence_length", None)
        or getattr(data_config, "sequence_kwargs", None)
    ):
        return None
    sequence_kwargs = dict(data_config.sequence_kwargs or {})
    if data_config.sequence_length:
        sequence_kwargs.setdefault("input_window", data_config.sequence_length)
    return sequence_kwargs or None


def prepare_splits(data, model, data_config, *, seed: Optional[int] = None):
    """Map a :class:`~easyhybrid_tpu.config.DataConfig` onto ``split_data``.

    Parity: reference ``prepare_splits`` (src/data/splits.jl:3-30)."""
    sequence_kwargs = merged_sequence_kwargs(data_config)
    return split_data(
        data,
        model,
        split_by_id=data_config.split_by_id,
        folds=data_config.folds,
        val_fold=data_config.val_fold,
        shuffleobs=data_config.shuffleobs,
        split_data_at=data_config.split_data_at,
        sequence_kwargs=sequence_kwargs,
        seed=seed,
    )
