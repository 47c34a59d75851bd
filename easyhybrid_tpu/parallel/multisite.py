"""Multi-site hybrid modeling: vmap across sites, shard sites over the mesh.

TPU-native addition (no reference counterpart — the reference is
single-series; SURVEY.md §5 and BASELINE.json's FLUXNET-scale config call for
"vmapped per-site hybrids, data-parallel batches over a v5e mesh").

Semantics: one :class:`~easyhybrid_tpu.models.hybrid.SingleNNHybridModel`
(or MultiNN) spec is lifted over a leading ``site`` axis.  Two modes:

* ``share_nn=True`` (default): the NN weights are shared across sites while
  global physical parameters are learned PER SITE (e.g. one Q10 per site) —
  the common scientific setup.
* ``share_nn=False``: every site gets its own NN weights too (vmapped init).

Data layout: ``x (S, N, F)``, forcing/targets ``(S, N)``. The vmapped fused
forward stays one XLA program; sharding the site axis over the mesh gives
embarrassing parallelism with zero collectives in the forward and one psum
for shared-weight gradients.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MultiSiteHybridModel", "prepare_multisite_data"]


@dataclasses.dataclass(frozen=True, eq=False)
class MultiSiteHybridModel:
    base: Any           # SingleNNHybridModel / MultiNNHybridModel
    n_sites: int
    share_nn: bool = True

    # ------------------------------------------------------------------
    @property
    def targets(self):
        return self.base.targets

    @property
    def forcing(self):
        return self.base.forcing

    @property
    def predictors(self):
        return self.base.predictors

    @property
    def parameters(self):
        return self.base.parameters

    @property
    def mechanistic_model(self):
        return self.base.mechanistic_model

    @property
    def neural_param_names(self):
        return self.base.neural_param_names

    @property
    def global_param_names(self):
        return self.base.global_param_names

    @property
    def fixed_param_names(self):
        return self.base.fixed_param_names

    @property
    def scale_nn_outputs(self):
        return getattr(self.base, "scale_nn_outputs", None)

    @property
    def nn(self):
        return getattr(self.base, "nn", None)

    @property
    def nns(self):
        return getattr(self.base, "nns", None)

    # ------------------------------------------------------------------
    def init(self, key):
        if self.share_nn:
            params, state = self.base.init(key)
            # per-site copies of the (trainable) globals only
            params = dict(params)
            params["globals"] = {
                g: jnp.tile(v[None, :], (self.n_sites, 1))
                for g, v in params["globals"].items()
            }
            return params, state
        keys = jax.random.split(key, self.n_sites)
        params, state = jax.vmap(self.base.init)(keys)
        # state (fixed params, bn stats) is identical across sites: keep one
        state = jax.tree.map(lambda a: a[0], state)
        return params, state

    # ------------------------------------------------------------------
    def apply(self, params, state, batch, *, training: bool = False):
        """``batch = (x, forcing)`` with a leading site axis on every array.

        When training minibatches over sites, ``forcing["_site_idx"]`` (added
        by :func:`prepare_multisite_data`) selects each batch row's slice of
        the per-site parameters — a gather, so site minibatching/shuffling
        works with per-site params of the FULL site count."""
        x, forcing = batch[0], dict(batch[1])
        site_idx = forcing.pop("_site_idx", None)

        def select(tree):
            if site_idx is None:
                return tree
            idx = site_idx.astype(jnp.int32)
            if idx.ndim > 1:
                idx = idx[..., 0]  # windowed/per-sample copies -> one per site
            return jax.tree.map(lambda a: a[idx], tree)

        if self.share_nn:
            site_globals = select(params["globals"])

            def site_apply(globals_, x, forcing):
                p = {**params, "globals": globals_}
                out, new_state = self.base.apply(
                    p, state, (x, forcing), training=training
                )
                return out, new_state

            outputs, new_states = jax.vmap(site_apply)(site_globals, x, forcing)
        else:
            site_params = select(params)

            def site_apply(p, x, forcing):
                return self.base.apply(p, state, (x, forcing), training=training)

            outputs, new_states = jax.vmap(site_apply)(site_params, x, forcing)

        # collapse the vmapped state back to one copy (site-invariant for
        # fixed params; batchnorm stats are averaged across sites)
        new_state = jax.tree.map(
            lambda a: jnp.mean(a, axis=0) if a.ndim > 0 else a, new_states
        )
        return outputs, new_state


def prepare_multisite_data(model, data, site_column: str):
    """Tabular data with a site id column → site-major :class:`HybridData`.

    Produces ``x (S, N, F)``, forcing/targets ``(S, N)`` where ``N`` is the
    longest site's length; shorter sites are padded with NaN targets (masked
    out) and zero predictors. Feed the result to ``train`` with a
    :class:`MultiSiteHybridModel` — batching then slices SITES, so a
    data-parallel mesh shards sites across chips.
    """
    from ..data.prepare import HybridData, dataframe_to_dict, prepare_data
    from ..data.xarray_io import is_xarray_like, xarray_to_dataframe

    if is_xarray_like(data):
        data = xarray_to_dataframe(data)
    if hasattr(data, "columns"):
        ids = np.asarray(data[site_column])
        cols = dataframe_to_dict(data)
    else:
        cols = {k: np.asarray(v) for k, v in data.items()}
        ids = np.asarray(cols[site_column])

    unique_ids = list(dict.fromkeys(ids.tolist()))
    per_site = []
    for sid in unique_ids:
        sel = np.nonzero(ids == sid)[0]
        site_cols = {k: np.asarray(v)[sel] for k, v in cols.items() if k != site_column}
        per_site.append(
            prepare_data(model, site_cols, drop_missing_rows=False)
        )

    n_max = max(d.n_samples for d in per_site)

    def pad_stack(get, fill):
        arrs = []
        for d in per_site:
            a = np.asarray(get(d), np.float32)
            if a.shape[0] < n_max:
                pad = [(0, n_max - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, pad, constant_values=fill)
            arrs.append(a)
        return np.stack(arrs)

    x = pad_stack(lambda d: d.x, 0.0)
    forcing = {
        f: pad_stack(lambda d, f=f: d.forcing[f], 0.0) for f in model.forcing
    }
    # per-site parameter selector: constant site index per row, so site
    # minibatches can gather their slice of the per-site params
    forcing["_site_idx"] = np.broadcast_to(
        np.arange(len(per_site), dtype=np.float32)[:, None], (len(per_site), n_max)
    ).copy()
    y = {t: pad_stack(lambda d, t=t: d.y[t], np.nan) for t in model.targets}
    return HybridData(x=x, forcing=forcing, y=y)
