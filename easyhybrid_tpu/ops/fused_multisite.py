"""Pallas TPU kernel: multi-site hybrid training epochs in ONE launch.

The FLUXNET-scale config (BASELINE.json config 5) trains a
:class:`~easyhybrid_tpu.parallel.multisite.MultiSiteHybridModel`: one shared
MLP over all (site, time) samples plus per-site global physical parameters
(e.g. one Q10 per site). The generic fused kernel (ops/fused_epoch.py)
cannot express per-site parameters, so the flagship config previously ran
the XLA scan epoch. This kernel closes that gap: ALL epochs of full-site
batch training run in ONE Pallas launch.

Design (built exclusively from primitives validated on this rig's Mosaic
build — tools/probe_multisite_primitives{,2}.py, 2026-08-17 on-chip runs):

* **Flattened samples, two layouts.** Each grid step processes a CHUNK of
  128 sites × N timesteps. The shared MLP sees feature-major ``(F, M)``
  blocks with ``M = N_pad·128`` and sample column ``t·128 + s`` (time-major
  within the chunk); all physics/loss math runs in the 2-D ``(N_pad, 128)``
  = (time, site) layout. The two meet through the on-chip reshape
  ``(1, M) ↔ (N_pad, 128)`` — PASS in the probe (exact).
* **Per-site parameters are VMEM-resident, packed site-major** as
  ``(R_pad, 128)`` tiles (site ``s`` ↔ row ``s//128``, lane ``s%128``);
  10k sites × (p, m, v) is ~120 kB. Chunk ``c``'s row is selected EXACTLY
  with a masked sublane ``jnp.sum`` (1 nonzero + zeros — no MXU rounding;
  dynamic sublane slicing ``ref[pl.ds(c,1)]`` CRASHES this build, and a
  ones-matmul select carries ~1e-3 bf16 rounding: probe rows 5/7) and
  written back with a full-buffer ``jnp.where(row == c, new, carried)``
  (probe ``row_mask_update`` PASS).
* **Per-site gradients need no cross-chunk accumulation**: with one full
  site batch per epoch, site ``s``'s gradient lives entirely in its chunk,
  so its Adam update applies immediately (bit-identical to updating at
  epoch end). Shared NN/scalar leaves accumulate gradients across chunks in
  carried accumulator tiles and update once at the LAST chunk.
* **Loss normalization is precomputed.** The masked-mean divisor
  ``n_t = Σ mask_t`` spans the whole site batch, which no single chunk
  sees; masks are static across epochs (no shuffle at one batch/epoch), so
  ``1/n_t`` and the validity flag are computed once XLA-side and streamed
  in as a padded tile.

Envelope (``supports_fused_multisite``): ``share_nn=True``,
``SingleNNHybridModel`` base with an MLP (input_batchnorm in
{False, "static"}, f32 — no compute_dtype), scalar per-site globals,
training loss in {mse, mae, nseLoss, rmse (single-target, round-4
deferred-factor scheme — gate-exact on-chip at 10k sites, 3.5e-4)} or a
declarative ``ElementwiseLoss`` (pinball/huber/…), agg in {sum, mean},
no ``extra_loss``. Optimizers:
every rule ``parse_opt_spec`` accepts — adam, adamw, sgd, rmsprop,
adagrad, lion, adamax, nadam, adadelta, radam (the update delegates to
the generic kernel's ``make_update_leaf_u``), plus — round 4 — lamb and
amsgrad. lamb: its per-LEAF trust ratio needs norms over the whole
stacked (S, 1) per-site leaf, so per-site updates defer to the
whole-tile path where the packed (R_pad, 128) tile IS the leaf and the
update's f32 tile-norm dots compute exactly optax's leaf norms.
amsgrad: optax's nu_max rides an optional third carried buffer set
(shared leaves + per-site packed tiles), exactly the generic kernel's
scheme. Site batching: ONE site batch per epoch
(``batchsize >= n_sites``, the standard full-batch multisite setup), or
MINIBATCHED sites (round 4) with — round 5 — ANY batchsize and any
standard shuffle mode (True / False / "batches"); the data's site order
must be the identity (``prepare_multisite_data``'s layout). A dst→src
SLOT map pads each batch's site axis to whole 128-lane packed rows
(dead slots carry zero data/masks/params) and, for the shuffle modes,
composes the XLA path's exact per-epoch site permutation
(``epoch_permutation``, same stream for the same key): data and the
packed per-site parameter tiles are gathered into slot order around ONE
kernel launch per epoch (``lax.scan``), and the tiles scatter back to
canonical site order after each launch — the kernel keeps its identity
chunk ↔ packed-row mapping throughout. Unshuffled runs keep the single
all-epochs launch (with a one-time static relayout when the batchsize
is not a 128 multiple). Every loss above qualifies: batch-local scales
stream per batch (recomputed per epoch under shuffle), and rmse's
deferred factor (late round 4) is batch-scoped — per-batch SSE
accumulators reset at each batch's first group and the ``agg/(2·n·r)``
factor applies at the batch's last group, exactly where minibatched
updates already defer. Minibatched updates defer to each batch's last
grid group as whole-tile per-site updates: out-of-batch packed rows
carry zero gradients, which is EXACTLY optax's zero-grad moment decay
for out-of-batch parameters, so parity with the XLA epoch is
bit-for-bit in interpret mode.

The loss envelope: chunk-local per-element terms whose scale depends only
on the static targets/masks (scale precomputed XLA-side, each chunk
independent). nseLoss qualifies because its denominator ``Σ (y-ȳ)²·m``
is a target-only batch statistic (masks are static at one batch/epoch) —
in-kernel it is mse math with a different precomputed scale. rmse
(round 4, single target) needs the FULL-batch sse in its ``1/(n·r)``
cotangent factor, which no single chunk sees — the kernel accumulates
RAW sse + unscaled ``2·diff`` cotangents across chunks (per-site grads in
packed accumulator tiles, shared grads in the existing accumulators) and
defers EVERY update to the last group, where the scalar factor
``agg/(2·n·r)`` is applied and the per-site tiles update whole-tile. The
remaining batch-statistic losses (pearsonLoss/kgeLoss/pbkgeLoss) have
cotangents that are NOT a scalar factor times a chunk-local row
(they mix ``dh``/``dy`` rows with three moment partials); they fall back
to the XLA epoch.

Reference parity: the multisite training semantics themselves are a
TPU-native addition (SURVEY.md §5; the reference is single-series), but the
per-step math matches the XLA path exactly — enforced by the same runtime
exactness gate as the generic kernel (``fused_exactness_check``).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..losses.specs import LoggingLoss
from ..models.hybrid import SingleNNHybridModel, _call_mechanistic
from ..models.nn import MLP
from ..params import scale_param
from .fused_epoch import (
    _buffer_shape,
    _ceil_to,
    _dot11,
    _from_kernel_buffer,
    _fused_loss_kind,
    _kernel_shape,
    _pad_to,
    _to_kernel_buffer,
    backward_mlp,
    forward_mlp,
    parse_opt_spec,
)

__all__ = ["supports_fused_multisite", "make_fused_multisite_epoch"]

_SITE_LANES = 128  # sites per chunk = one packed row
# chunk-local losses (see module docstring) + rmse (round 4): rmse's
# 1/(n·r) cotangent factor needs the FULL-batch SSE, so the kernel
# accumulates UNSCALED diff cotangents across chunks and defers every
# update (per-site tiles included) to the last group, where the factor is
# known — single-target only (multi-target would need one accumulator set
# per target). pearson/kge/pbkge stay out: their cotangents are not a
# scalar factor times a chunk-local row.
_MS_LOSSES = ("mse", "mae", "nseLoss", "rmse")


def _ms_loss_kind(training_loss, n_targets: int = 1):
    """The multisite-kernel loss envelope: a ``_MS_LOSSES`` string, an
    ``ElementwiseLoss`` instance, or ``None`` (→ XLA fallback)."""
    from ..losses.specs import ElementwiseLoss

    kind = _fused_loss_kind(training_loss)
    if kind == "rmse" and n_targets != 1:
        return None  # deferred factor is per-target; one accumulator set
    if isinstance(kind, ElementwiseLoss) or kind in _MS_LOSSES:
        return kind
    return None


def supports_fused_multisite(model, optimizer_spec, logging: LoggingLoss,
                             tensors=None, *, shuffle: Any = False) -> bool:
    """Static support check for the multisite fused-epoch fast path.
    ``tensors`` (when available) additionally checks the site-batching
    requirements: one batch per epoch, or minibatched sites with a
    128-multiple batch, ``shuffle=False``, identity site order, and a
    batch-local loss (see the module docstring's envelope)."""
    from ..parallel.multisite import MultiSiteHybridModel

    if not isinstance(model, MultiSiteHybridModel):
        return False
    if not model.share_nn:
        return False
    base = model.base
    if not isinstance(base, SingleNNHybridModel):
        return False
    if base.nn is not None:
        if not isinstance(base.nn, MLP):
            return False
        if base.nn.input_batchnorm is True:  # trainable running-stats BN
            return False
        if base.nn.compute_dtype is not None:
            return False
        if not base.neural_param_names:
            return False
    if logging.extra_loss is not None:
        return False
    if _ms_loss_kind(logging.training_loss, len(base.targets)) is None:
        return False
    if logging.agg_name not in ("sum", "mean"):
        return False
    parsed_opt = parse_opt_spec(optimizer_spec)
    if parsed_opt is None:
        return False
    from .fused_epoch import _NOISE_OPTS

    if parsed_opt[0] in _NOISE_OPTS:
        # noisy_sgd's pre-generated noise stream (round 5) is plumbed
        # through the GENERIC kernel only; this kernel has no per-step
        # noise operand — XLA path
        return False
    # Round 4 closed the optimizer envelope: lamb (a _WHOLELEAF_OPTS rule)
    # defers per-site updates to the whole-tile path, where the packed
    # tile IS the stacked leaf and the update's tile norms equal optax's
    # leaf norms; amsgrad (_SLOT3_OPTS) carries its nu_max in an optional
    # third buffer set (shared + per-site packed tiles). Every rule
    # parse_opt_spec accepts now runs in-kernel.
    if tensors is not None and int(tensors.weight.shape[0]) != 1:
        # MINIBATCHED sites (round 4): the loss must be batch-local
        # (per-batch scales precompute). rmse joins late round 4: its
        # deferred factor is BATCH-scoped here — per-batch SSE
        # accumulators reset at each batch's first group and the factor
        # applies at the batch's last group, where updates already defer.
        # Updates defer to each batch's END as whole-tile per-site
        # updates, so out-of-batch sites get exactly optax's zero-grad
        # moment decay. Round 5 removed the 128-multiple-batchsize and
        # shuffle=False requirements: a dst→src slot map pads each batch
        # to whole packed rows and composes the per-epoch site
        # permutation, with the packed tiles gathered/scattered around
        # one launch per epoch (see make_fused_multisite_epoch).
        if shuffle not in (True, False, "batches"):
            return False
        sidx = tensors.forcing.get("_site_idx")
        if sidx is not None:
            # chunk c ↔ packed row c needs IDENTITY site order in the data
            # (prepare_multisite_data's layout; a custom loader could
            # reorder). Slice BEFORE np.asarray so a device-resident array
            # transfers only nb·S_b scalars, not the full (nb, S_b, N)
            # block (readbacks degrade async dispatch on this rig —
            # fused_epoch keeps the gate to one readback for the same
            # reason).
            first = np.asarray(sidx[..., 0]).reshape(-1)
            n = int(tensors.n_samples)
            if not np.array_equal(first[:n], np.arange(n, dtype=first.dtype)):
                return False
    return True


def _pack_site_leaf(leaf, n_sites: int, r: int, r_pad: int):
    """(S, 1) per-site leaf → (R_pad, 128) site-major packed tile."""
    v = jnp.asarray(leaf, jnp.float32).reshape(-1)
    v = jnp.pad(v, (0, r * _SITE_LANES - n_sites))
    arr = v.reshape(r, _SITE_LANES)
    return jnp.pad(arr, ((0, r_pad - r), (0, 0)))


def _unpack_site_leaf(arr, n_sites: int, orig_shape):
    """(R_pad, 128) packed tile → original (S, 1) per-site leaf."""
    return arr.reshape(-1)[:n_sites].reshape(orig_shape)


def make_fused_multisite_epoch(
    model,
    state,
    optimizer_spec,
    logging: LoggingLoss,
    *,
    shuffle: Any = True,
    epochs_per_call: int = 1,
    interpret: Optional[bool] = None,
):
    """Build ``fn(params, opt_state, state, tensors, key) -> (params,
    opt_state, state, mean_loss)`` — drop-in for ``make_train_epoch`` on a
    :class:`MultiSiteHybridModel`, with ``opt_state`` from
    :func:`~easyhybrid_tpu.ops.fused_epoch.init_fused_opt_state`.

    With one site batch per epoch there is nothing to shuffle (the XLA
    path's sample shuffle only permutes BETWEEN batches), so any ``shuffle``
    mode is accepted and the ``key`` is unused. MINIBATCHED sites accept
    ``shuffle`` in (True, False, "batches") — round 5: the shuffled modes
    run one launch per epoch with the XLA path's exact per-epoch site
    permutation composed into the slot map (module docstring).
    """
    base = model.base
    parsed = parse_opt_spec(optimizer_spec)
    if parsed is None:
        raise ValueError(
            f"fused multisite epoch does not support optimizer {optimizer_spec!r}"
        )
    opt_name, hyper = parsed
    from .fused_epoch import _SLOT3_OPTS, make_update_leaf_u

    # amsgrad (round 4): optax's nu_max rides an optional third carried
    # buffer set (shared leaves + per-site packed tiles), mirroring the
    # generic kernel's scheme. The uniform 3-slot protocol passes the w
    # slot through untouched for 2-slot rules (w is None then).
    use_u = opt_name in _SLOT3_OPTS
    update_leaf = make_update_leaf_u(opt_name, hyper)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    from ..losses.specs import ElementwiseLoss

    loss_kind = _ms_loss_kind(logging.training_loss, len(base.targets))
    if loss_kind is None:
        raise ValueError(
            "fused multisite epoch does not support training loss "
            f"{logging.training_loss!r}"
        )
    # rmse (round 4): 1/(n·r) factor spans the whole site batch → the
    # kernel accumulates UNSCALED diff cotangents and defers all updates
    # (per-site tiles included, whole-tile at the last group)
    deferred_loss = loss_kind == "rmse"
    elem_spec = loss_kind if isinstance(loss_kind, ElementwiseLoss) else None
    agg_name = logging.agg_name
    if logging.extra_loss is not None:
        raise ValueError("fused multisite epoch does not support extra_loss")

    forcing_names = tuple(base.forcing)
    target_names = tuple(base.targets)
    neural_names = tuple(base.neural_param_names) if base.nn is not None else ()
    global_names = tuple(base.global_param_names)
    bounds = {
        name: (base.parameters.lower_of(name), base.parameters.upper_of(name))
        for name in (*neural_names, *global_names)
    }
    n_targets = len(target_names)
    agg_scale = 1.0 / n_targets if agg_name == "mean" else 1.0
    _PAD = (8, 128)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt_state, state_in, tensors, key):
        # key: consumed only by minibatched shuffle modes (round 5); the
        # static site partitions (no shuffle / one batch) ignore it
        epochs = max(1, int(epochs_per_call))

        # ---- MINIBATCHED sites (round 4) ---------------------------------
        # Several site batches per epoch generalize the one-batch design:
        # the batched site axis FLATTENS into one contiguous axis (build_
        # epoch_tensors batches consecutive sites, zero-padding only the
        # last batch), so the chunk layout/packing below works verbatim;
        # what changes is the UPDATE boundary — per-site and shared
        # updates defer to each batch's LAST group as whole-tile updates
        # (out-of-batch packed rows carry zero grads, so they receive
        # exactly optax's zero-gradient moment decay), loss scales/validity
        # stream per batch, and the step counter advances once per batch.
        nb = int(tensors.weight.shape[0])
        minibatch = nb > 1
        # lamb (round 4): its per-LEAF trust ratio needs norms over the
        # WHOLE stacked (S, 1) per-site leaf — unavailable to a chunk-local
        # row update, but the packed (R_pad, 128) tile IS the whole leaf,
        # so deferring per-site updates to the whole-tile path (the
        # rmse/minibatch machinery) makes make_update_leaf's tile-wide
        # f32 norm dots compute exactly optax's leaf norms (padding slots
        # hold zero params/grads/moments and stay zero under lamb).
        deferred_site = deferred_loss or minibatch or opt_name == "lamb"
        do_shuffle = minibatch and shuffle is True
        do_bshuffle = minibatch and shuffle == "batches"
        if minibatch:
            # Round 5 lifts the round-4 restrictions. A dst→src SLOT map
            # mediates between the kernel's packed layout (each batch's
            # site axis padded to whole 128-lane rows) and the data's
            # layout: slot p = b·S_bp + j reads data slot b·S_b0 + j
            # (dead for j >= S_b0 — zero data, zero masks), so ANY
            # batchsize works. Shuffle modes COMPOSE the XLA path's exact
            # per-epoch permutation (same epoch_permutation stream for the
            # same key) into the map: data AND the packed per-site
            # parameter tiles are gathered into slot order around ONE
            # launch per epoch (lax.scan), and the tiles are scattered
            # back to canonical site order after each launch — the kernel
            # itself keeps its identity chunk ↔ packed-row mapping.
            if shuffle not in (True, False, "batches"):
                raise ValueError(
                    "fused multisite epoch supports shuffle="
                    f"True/False/'batches', got {shuffle!r}"
                )
            s_b0 = int(tensors.x.shape[-3])
            s_b = _ceil_to(s_b0, _SITE_LANES)  # kernel-facing batch width
            n0 = nb * s_b0          # XLA slot count (perm space)
            n_slots = nb * s_b      # padded slot count (r·128)
            base_src_np = (
                np.arange(nb, dtype=np.int32)[:, None] * s_b0
                + np.minimum(np.arange(s_b, dtype=np.int32), s_b0 - 1)[None]
            ).reshape(-1)
            base_dead_np = np.broadcast_to(
                np.arange(s_b) >= s_b0, (nb, s_b)
            ).reshape(-1)
            identity_slots = (s_b == s_b0) and not (do_shuffle or do_bshuffle)
            flat0 = dict(
                x=tensors.x.reshape((n0,) + tensors.x.shape[2:]),
                forcing={k: v.reshape((n0,) + v.shape[2:])
                         for k, v in tensors.forcing.items()},
                y={k: v.reshape((n0,) + v.shape[2:])
                   for k, v in tensors.y.items()},
                mask={k: v.reshape((n0,) + v.shape[2:])
                      for k, v in tensors.mask.items()},
            )

            def slot_data(src, dead):
                """dst-slot views of the flattened data (n_slots, ...);
                the identity map skips the gathers entirely."""
                if src is None:
                    return flat0

                def g(a):
                    v = jnp.take(a, src, axis=0)
                    dm = dead.reshape((-1,) + (1,) * (v.ndim - 1))
                    return jnp.where(dm, jnp.zeros_like(v), v)

                return dict(
                    x=g(flat0["x"]),
                    forcing={k: g(v) for k, v in flat0["forcing"].items()},
                    y={k: g(v) for k, v in flat0["y"].items()},
                    mask={k: g(v) for k, v in flat0["mask"].items()},
                )

        # ---- split params: shared leaves vs per-site globals -------------
        site_names = tuple(params["globals"].keys())
        shared_params = {k: v for k, v in params.items() if k != "globals"}
        m_tree, v_tree = opt_state["m"], opt_state["v"]
        shared_m = {k: v for k, v in m_tree.items() if k != "globals"}
        shared_v = {k: v for k, v in v_tree.items() if k != "globals"}
        if use_u:
            # amsgrad nu_max: a third state tree (init_fused_opt_state
            # adds it when the spec names a _SLOT3_OPTS rule; zeros match
            # optax.scale_by_amsgrad's init if a caller built without it)
            u_tree = opt_state.get("u")
            if u_tree is None:
                u_tree = jax.tree.map(jnp.zeros_like, params)
            shared_u = {k: v for k, v in u_tree.items() if k != "globals"}

        sh_leaves, sh_treedef = jax.tree.flatten(shared_params)
        sh_shapes = [l.shape for l in sh_leaves]
        sh_bufs = [_to_kernel_buffer(l) for l in sh_leaves]
        shm_bufs = [_to_kernel_buffer(l) for l in jax.tree.leaves(shared_m)]
        shv_bufs = [_to_kernel_buffer(l) for l in jax.tree.leaves(shared_v)]
        shu_bufs = (
            [_to_kernel_buffer(l) for l in jax.tree.leaves(shared_u)]
            if use_u else []
        )
        buf_shapes = [_buffer_shape(s) for s in sh_shapes]
        npar = len(sh_bufs)

        n_sites_total = int(np.prod(params["globals"][site_names[0]].shape))
        site_shapes = {g: params["globals"][g].shape for g in site_names}
        if minibatch:
            # one packed row set spanning ALL batches' (padded) sites:
            # data chunk cc maps to packed row cc directly
            r_b = s_b // _SITE_LANES
            r = nb * r_b
        else:
            r = -(-n_sites_total // _SITE_LANES)  # used packed rows
        # sub-chunk unrolling: process `unroll` 128-site chunks per grid
        # step — the per-grid-step sequencing overhead (~3 µs on this rig,
        # measured round 3) dominates the tiny-MLP FLOPs, and sub-chunks
        # within a site batch are independent (shared grads just
        # accumulate), so unrolling amortizes it
        unroll = max(
            1, min(int(os.environ.get("EASYHYBRID_MS_UNROLL", "4")), r)
        )
        if minibatch:
            # a grid group must not straddle a batch boundary: shrink the
            # unroll to a divisor of the per-batch chunk count
            unroll = min(unroll, r_b)
            while r_b % unroll:
                unroll -= 1
        n_groups = -(-r // unroll)
        n_groups_b = n_groups // nb if minibatch else n_groups
        r_eff = n_groups * unroll
        # packed tiles must hold EVERY site even when the DATA covers fewer
        # (the exactness gate slices to 2 batches): whole-tile deferred
        # updates at batch ends still decay the out-of-data rows exactly
        # like optax, and the row-select only reads rows < r (the data
        # chunks), so extra rows are update-only. With the round-5 slot
        # map the tail sites (ids >= n0, uncovered by the data) occupy the
        # rows immediately after the n_slots data slots in SLOT layout —
        # r grows by the tail's row count so the map stays injective.
        if minibatch:
            tail_sites = max(0, n_sites_total - n0)
            r_rows = r + -(-tail_sites // _SITE_LANES)
        else:
            r_rows = max(r, -(-n_sites_total // _SITE_LANES))
        r_pad = _ceil_to(max(r_eff, r_rows), 8)
        sp_bufs = [
            _pack_site_leaf(params["globals"][g], n_sites_total, r_rows, r_pad)
            for g in site_names
        ]
        spm_bufs = [
            _pack_site_leaf(m_tree["globals"][g], n_sites_total, r_rows, r_pad)
            for g in site_names
        ]
        spv_bufs = [
            _pack_site_leaf(v_tree["globals"][g], n_sites_total, r_rows, r_pad)
            for g in site_names
        ]
        spu_bufs = (
            [_pack_site_leaf(u_tree["globals"][g], n_sites_total, r_rows,
                             r_pad)
             for g in site_names]
            if use_u else []
        )
        nsite = len(sp_bufs)

        # ---- slot ↔ canonical tile permutation (round 5) ------------------
        # canonical layout: site i at flat position i (_pack_site_leaf).
        # SLOT layout (what the launch consumes): position p < n_slots
        # holds site src_full[p]; positions >= n_slots hold the tail sites
        # n0, n0+1, … (data-uncovered, update-only rows). Dead slots (the
        # per-batch 128-alignment padding) hold zeros — zero params with
        # zero masks produce zero grads, and whole-tile decay keeps their
        # zero moments zero, so they never leak into real sites.
        if minibatch:
            L_flat = r_pad * _SITE_LANES
            tail_src_np = n0 + np.arange(L_flat - n_slots, dtype=np.int32)

            def slot_src_full(src):
                return jnp.concatenate(
                    [jnp.asarray(src, jnp.int32),
                     jnp.asarray(tail_src_np)]
                )

            def tile_to_slots(tile, src_full, dead_full):
                flat = tile.reshape(-1)
                v = jnp.take(flat, jnp.clip(src_full, 0, L_flat - 1))
                return jnp.where(dead_full, 0.0, v).reshape(
                    r_pad, _SITE_LANES
                )

            def tile_to_canonical(tile_s, src_full, dead_full):
                flat = tile_s.reshape(-1)
                idx = jnp.where(dead_full, L_flat, src_full)  # dead → drop
                return (
                    jnp.zeros((L_flat,), jnp.float32)
                    .at[idx].set(flat, mode="drop")
                    .reshape(r_pad, _SITE_LANES)
                )

            # tail positions are never dead: tail_src < L_flat always
            # (n0 <= n_slots ⟹ n0 + L_flat - n_slots - 1 < L_flat)
            dead_full_base = jnp.asarray(
                np.concatenate(
                    [base_dead_np, np.zeros(L_flat - n_slots, bool)]
                )
            )

        # ---- data relayout: site batch → chunked time-major blocks -------
        # inputs: x (S_dim, N, F), forcing/y/mask (S_dim, N) — S_dim is the
        # padded slot count for minibatched sites, the raw site-batch width
        # otherwise
        n_dim = int(tensors.x.shape[-2])
        s_pad = r * _SITE_LANES
        n_pad = _ceil_to(n_dim, 8)
        m_cols = n_pad * _SITE_LANES
        n_feat = int(tensors.x.shape[-1])

        def make_data_ops(x_all, forcing_all, y_all, mask_all):
            s_dim = x_all.shape[0]

            def chunk_time_site(a2):
                """(S, N) → (r, N_pad, 128) blocks in (time, site)."""
                a2 = jnp.pad(a2, ((0, s_pad - s_dim), (0, n_pad - n_dim)))
                return jnp.transpose(
                    a2.reshape(r, _SITE_LANES, n_pad), (0, 2, 1)
                )

            # x: (S, N, F) → (r, F, M) feature-major, column t·128 + s
            xp = jnp.pad(
                x_all, ((0, s_pad - s_dim), (0, n_pad - n_dim), (0, 0))
            )
            x_c = jnp.transpose(
                xp.reshape(r, _SITE_LANES, n_pad, n_feat), (0, 3, 2, 1)
            ).reshape(r, n_feat, m_cols)
            f_c = [chunk_time_site(forcing_all[f]) for f in forcing_names]
            y_c = [chunk_time_site(y_all[t]) for t in target_names]
            m_c = [chunk_time_site(mask_all[t]) for t in target_names]

            # group chunks for the unrolled grid: (n_groups, unroll, ...);
            # tail-padding chunks carry zero masks — they contribute nothing
            def group(a):
                a = jnp.pad(
                    a, ((0, r_eff - r),) + ((0, 0),) * (a.ndim - 1)
                )
                return a.reshape((n_groups, unroll) + a.shape[1:])

            return (
                group(x_c),
                [group(a) for a in f_c],
                [group(a) for a in y_c],
                [group(a) for a in m_c],
            )

        # ---- loss normalization + validity tile (batch-static) ----------
        # row 0 lane j: the per-target elementwise loss scale sc_j (see the
        # kernel's loss section); [1, 0]: validity flag. Every supported
        # loss has a scale that depends ONLY on static targets/masks (the
        # chunk-locality criterion), so it is computed once here:
        #   mse/mae, elementwise(mean):  agg_scale / max(Σ mask_j, 1)
        #   nseLoss:                     agg_scale / max(Σ (y-ȳ)²·m, eps)
        #   elementwise(sum):            agg_scale
        def _batch_scale_tile(masks_b, ys_b):
            """One (8, 128) scale/validity tile for a site batch: masks_b /
            ys_b map target → that batch's (S_b, N) arrays."""
            counts = jnp.stack(
                [jnp.sum(masks_b[t]) for t in target_names]
            )
            if loss_kind == "nseLoss":
                # exactly losses/metrics.py::_sse_over_sst's denominator
                # (y pre-zeroed at invalid slots, matching _sanitize)
                ssts = []
                for t in target_names:
                    y2, m2 = ys_b[t], masks_b[t]
                    n2 = jnp.maximum(jnp.sum(m2), 1.0)
                    mu2 = jnp.sum(y2 * m2) / n2
                    dev2 = (y2 - mu2) * m2
                    ssts.append(jnp.sum(dev2 * dev2))
                sc = agg_scale / jnp.maximum(jnp.stack(ssts), 1e-12)  # _EPS
            elif elem_spec is not None and elem_spec.normalize == "sum":
                sc = jnp.full((n_targets,), agg_scale, jnp.float32)
            elif loss_kind == "rmse":
                # deferred scaling: chunks accumulate RAW sse / diff
                # cotangents; the last group applies agg_scale/(n·r)
                sc = jnp.ones((n_targets,), jnp.float32)
            else:
                sc = agg_scale / jnp.maximum(counts, 1.0)  # (T,)
            valid_flag = (jnp.sum(counts) > 0.0).astype(jnp.float32)
            tile = jnp.zeros(_PAD, jnp.float32)
            tile = jax.lax.dynamic_update_slice(
                tile, sc.astype(jnp.float32)[None, :], (0, 0)
            )
            tile = tile.at[1, 0].set(valid_flag)
            # [1, 1]: 1/n for the deferred rmse factor (single target)
            return tile.at[1, 1].set(1.0 / jnp.maximum(counts[0], 1.0))

        def make_scale_op(mask_d, y_d):
            """Scale/validity tiles from SLOT-layout masks/targets
            (dead slots carry zero masks, so counts/SST/validity equal the
            XLA path's per-batch values): one streamed tile per grid group
            (minibatch) or the single full-batch tile."""
            if minibatch:
                tiles = jax.vmap(
                    lambda mb, yb: _batch_scale_tile(
                        dict(zip(target_names, mb)),
                        dict(zip(target_names, yb)),
                    )
                )(
                    jnp.stack(
                        [mask_d[t].reshape(nb, s_b, -1)
                         for t in target_names], 1
                    ),
                    jnp.stack(
                        [y_d[t].reshape(nb, s_b, -1)
                         for t in target_names], 1
                    ),
                )  # (nb, 8, 128)
                return jnp.repeat(tiles, n_groups_b, axis=0)
            return _batch_scale_tile(mask_d, y_d)

        # ---- state buffers (same scheme as the generic kernel) -----------
        st_leaves, st_treedef = jax.tree.flatten(state_in)
        st_orig_shapes = [jnp.shape(l) for l in st_leaves]
        st_bufs = [_to_kernel_buffer(l) for l in st_leaves]
        nst = len(st_bufs)

        # step counter: int32 master XLA-side; kernel carries the launch's
        # valid-step delta (fused_epoch.py scheme)
        t0 = opt_state["t"].reshape(())
        t_base_tile = jnp.zeros(_PAD, jnp.float32) + t0.astype(jnp.float32)

        def read_forward(buf, orig_shape):
            a, b = _kernel_shape(orig_shape)
            v = buf[0:a, 0:b]
            return v.T if len(orig_shape) == 1 else v

        def to_ts(v):
            """Any mechanistic operand → (N_pad, 128) tile, avoiding the
            both-axes broadcast Mosaic cannot lower (bug catalog rule 3)."""
            v = jnp.asarray(v, jnp.float32)
            if v.ndim == 0:
                return jnp.zeros((n_pad, _SITE_LANES), jnp.float32) + v
            if v.shape == (1, 1):
                return jnp.zeros((n_pad, _SITE_LANES), jnp.float32) + v[0, 0]
            return jnp.broadcast_to(v, (n_pad, _SITE_LANES))

        nf, nt = len(forcing_names), n_targets

        def kernel(*refs):
            idx = 0
            x_ref = refs[idx]; idx += 1
            f_refs = refs[idx : idx + nf]; idx += nf
            y_refs = refs[idx : idx + nt]; idx += nt
            m_refs = refs[idx : idx + nt]; idx += nt
            scale_ref = refs[idx]; idx += 1
            n_up = npar if use_u else 0    # amsgrad third-slot buffers
            n_us = nsite if use_u else 0
            st_refs = refs[idx : idx + nst]; idx += nst
            psh_in = refs[idx : idx + npar]; idx += npar
            msh_in = refs[idx : idx + npar]; idx += npar
            vsh_in = refs[idx : idx + npar]; idx += npar
            ush_in = refs[idx : idx + n_up]; idx += n_up
            pst_in = refs[idx : idx + nsite]; idx += nsite
            mst_in = refs[idx : idx + nsite]; idx += nsite
            vst_in = refs[idx : idx + nsite]; idx += nsite
            ust_in = refs[idx : idx + n_us]; idx += n_us
            t_in = refs[idx]; idx += 1
            psh_out = refs[idx : idx + npar]; idx += npar
            msh_out = refs[idx : idx + npar]; idx += npar
            vsh_out = refs[idx : idx + npar]; idx += npar
            ush_out = refs[idx : idx + n_up]; idx += n_up
            pst_out = refs[idx : idx + nsite]; idx += nsite
            mst_out = refs[idx : idx + nsite]; idx += nsite
            vst_out = refs[idx : idx + nsite]; idx += nsite
            ust_out = refs[idx : idx + n_us]; idx += n_us
            acc_out = refs[idx : idx + npar]; idx += npar
            t_out = refs[idx]; idx += 1
            loss_out = refs[idx]; idx += 1
            sacc_out = refs[idx : idx + nsite] if deferred_site else ()

            ones_m1 = jnp.ones((m_cols, 1), jnp.float32)
            e = pl.program_id(0)
            c = pl.program_id(1)        # GROUP index (unroll sub-chunks)
            first = (e + c) == 0        # very first grid step
            chunk_start = c == 0        # first group of an EPOCH (loss reset)
            if minibatch:
                # update boundary = each site BATCH's last group; grad
                # accumulators reset at its first group
                gb = jax.lax.rem(c, n_groups_b)
                acc_start = gb == 0
                do_update = gb == (n_groups_b - 1)
            else:
                acc_start = chunk_start
                do_update = c == (n_groups - 1)

            # carried buffers (rule 1: no aliasing — seed from inputs once)
            pb = [jnp.where(first, psh_in[k][...], psh_out[k][...])
                  for k in range(npar)]
            mb = [jnp.where(first, msh_in[k][...], msh_out[k][...])
                  for k in range(npar)]
            vb = [jnp.where(first, vsh_in[k][...], vsh_out[k][...])
                  for k in range(npar)]
            ub = [jnp.where(first, ush_in[k][...], ush_out[k][...])
                  for k in range(n_up)]
            # per-site packed buffers become LOCAL values mutated through
            # the unrolled sub-chunk loop; written back once at the end
            pkt = [jnp.where(first, pst_in[k][...], pst_out[k][...])
                   for k in range(nsite)]
            mkt = [jnp.where(first, mst_in[k][...], mst_out[k][...])
                   for k in range(nsite)]
            vkt = [jnp.where(first, vst_in[k][...], vst_out[k][...])
                   for k in range(nsite)]
            ukt = [jnp.where(first, ust_in[k][...], ust_out[k][...])
                   for k in range(n_us)]

            # streamed per-batch tile (minibatch) vs the one full tile
            scl = scale_ref[0] if minibatch else scale_ref[...]
            valid = scl[1, 0]
            t_prev = jnp.where(first, jnp.float32(0.0), t_out[0, 0])
            t_cur = t_prev + valid          # one optimizer step per BATCH
            t_abs = t_in[0, 0] + t_cur      # absolute count for bias corr.

            p_shared = jax.tree.unflatten(
                sh_treedef,
                [read_forward(b_, s) for b_, s in zip(pb, sh_shapes)],
            )
            state2d = jax.tree.unflatten(
                st_treedef,
                [read_forward(rf[...], s)
                 for rf, s in zip(st_refs, st_orig_shapes)],
            )

            rows_pk = jax.lax.broadcasted_iota(
                jnp.int32, (r_pad, _SITE_LANES), 0
            )

            acc_local = [None] * npar   # shared-grad accumulation over subs
            sgrad_local = [None] * nsite  # deferred-rmse per-site grads
            loss_local = None

            for u in range(unroll):
                cc = c * unroll + u     # absolute chunk / packed-row index
                rowmask = rows_pk == cc

                def select_row(packed, _rm=rowmask):
                    """EXACT row select: masked sublane sum (probe-validated;
                    one nonzero + zeros per lane)."""
                    return jnp.sum(
                        jnp.where(_rm, packed, 0.0), axis=0, keepdims=True
                    )  # (1, 128)

                # ---- forward --------------------------------------------
                mech_params: Dict[str, Any] = {}
                dscale: Dict[str, Any] = {}
                nn_res = None
                x_fb = x_ref[0, u]  # (F, M)

                if neural_names:
                    nn_out, nn_res, _ = forward_mlp(
                        base.nn, p_shared["nn"], state2d.get("nn", {}),
                        x_fb, ones_m1,
                    )
                    for j, name in enumerate(neural_names):
                        raw_ts = nn_out[j : j + 1, :].reshape(
                            n_pad, _SITE_LANES
                        )
                        if base.scale_nn_outputs:
                            lo, up = bounds[name]
                            col, dcol = jax.jvp(
                                lambda rw, _lo=lo, _up=up: scale_param(
                                    rw, _lo, _up
                                ),
                                (raw_ts,), (jnp.ones_like(raw_ts),),
                            )
                            mech_params[name] = col
                            dscale[name] = dcol
                        else:
                            mech_params[name] = raw_ts
                            dscale[name] = None

                for k, g in enumerate(site_names):
                    lo, up = bounds[g]
                    raw_row = select_row(pkt[k])  # (1,128) raw per-site
                    val_row, dval_row = jax.jvp(
                        lambda rw, _lo=lo, _up=up: scale_param(rw, _lo, _up),
                        (raw_row,), (jnp.ones_like(raw_row),),
                    )
                    mech_params[g] = jnp.broadcast_to(
                        val_row, (n_pad, _SITE_LANES)
                    )
                    dscale[g] = dval_row  # (1,128) per-site scale deriv
                for f in base.fixed_param_names:
                    fx = state2d["fixed"][f]
                    mech_params[f] = fx[0, 0]  # rank-0 broadcasts w/ tiles

                forcing_ts = {
                    f: f_refs[j][0, u] for j, f in enumerate(forcing_names)
                }
                y_ts = [y_refs[j][0, u] for j in range(nt)]
                mask_ts = [m_refs[j][0, u] for j in range(nt)]

                def mech_preds(pd, _forcing=forcing_ts):
                    outs = _call_mechanistic(
                        base.mechanistic_model, {**_forcing, **pd}
                    )
                    return tuple(to_ts(outs[t]) for t in target_names)

                diff_names = (*neural_names, *site_names)
                tangents: Dict[str, Tuple[Any, ...]] = {}
                preds = None
                for name in diff_names:
                    def fdiff(v, _name=name, _mp=mech_params,
                              _f=mech_preds):
                        pd = dict(_mp)
                        pd[_name] = v
                        return _f(pd)

                    preds, tangents[name] = jax.jvp(
                        fdiff, (mech_params[name],),
                        (jnp.ones_like(mech_params[name]),),
                    )
                if preds is None:
                    preds = mech_preds(mech_params)

                # ---- loss + cotangents (scale precomputed) --------------
                cots: List[Any] = []
                loss_elem = None
                for j in range(nt):
                    m = mask_ts[j]
                    diff = (preds[j] - y_ts[j]) * m
                    sc_j = scl[0, j]  # batch-wide per-target scale
                    if elem_spec is not None:
                        # declarative elementwise loss: values AND the
                        # diagonal dℓ/dŷ from one forward-mode jvp (same
                        # scheme as fused_epoch.py; exactness gate verifies
                        # the elementwise contract at runtime). ŷ is
                        # mask-multiplied to mirror _sanitize.
                        yh_s = preds[j] * m
                        elem, delem = jax.jvp(
                            lambda v, _y=y_ts[j]: elem_spec.elementwise(
                                v, _y
                            ),
                            (yh_s,), (jnp.ones_like(yh_s),),
                        )
                        term = sc_j * elem * m
                        cot = sc_j * delem * m
                    elif loss_kind in ("mse", "nseLoss", "rmse"):
                        # nseLoss IS mse math in-kernel: sc_j carries the
                        # target-only denominator instead of 1/n. rmse runs
                        # with sc_j = 1 (RAW sse + unscaled 2·diff
                        # cotangents); the deferred agg/(2·n·r) factor is
                        # applied at the last group once sse is complete
                        term = sc_j * diff * diff
                        cot = (2.0 * sc_j) * diff
                    else:  # mae
                        term = sc_j * jnp.abs(diff)
                        cot = sc_j * jnp.sign(diff)
                    loss_elem = (
                        term if loss_elem is None else loss_elem + term
                    )
                    cots.append(cot)
                lsum_row = jnp.sum(loss_elem, axis=0, keepdims=True)
                chunk_loss = _dot11(lsum_row, jnp.ones_like(lsum_row))[0, 0]
                loss_local = (
                    chunk_loss if loss_local is None
                    else loss_local + chunk_loss
                )

                # ---- backward -------------------------------------------
                def param_grad_ts(name, _cots=cots, _tang=tangents):
                    row = None
                    for j in range(nt):
                        contrib = _cots[j] * _tang[name][j]
                        row = contrib if row is None else row + contrib
                    return row  # (N_pad, 128)

                # per-site params: chunk-local grad → immediate update of
                # the LOCAL packed value (bit-identical to a batch-end
                # update: each site appears in exactly one sub-chunk).
                # Deferred-rmse mode instead ACCUMULATES the raw per-site
                # grads into a packed tile — the update needs the global
                # 1/(n·r) factor only known at the last group.
                for k, g in enumerate(site_names):
                    gts = param_grad_ts(g)
                    grow = (
                        jnp.sum(gts, axis=0, keepdims=True) * dscale[g]
                    )  # (1, 128)
                    if deferred_site:
                        placed = jnp.where(
                            rowmask,
                            jnp.broadcast_to(grow, (r_pad, _SITE_LANES)),
                            0.0,
                        )
                        sgrad_local[k] = (
                            placed if sgrad_local[k] is None
                            else sgrad_local[k] + placed
                        )
                        continue
                    p_new, m_new, v_new, u_new = update_leaf(
                        select_row(pkt[k]), select_row(mkt[k]),
                        select_row(vkt[k]),
                        select_row(ukt[k]) if use_u else None,
                        grow, valid, t_abs,
                    )

                    def place(row_new, carried, _rm=rowmask):
                        return jnp.where(
                            _rm,
                            jnp.broadcast_to(
                                row_new, (r_pad, _SITE_LANES)
                            ),
                            carried,
                        )

                    pkt[k] = place(p_new, pkt[k])
                    mkt[k] = place(m_new, mkt[k])
                    vkt[k] = place(v_new, vkt[k])
                    if use_u:
                        ukt[k] = place(u_new, ukt[k])

                # shared-grad contribution of this sub-chunk
                if neural_names:
                    gcols = []
                    for name in neural_names:
                        gts = param_grad_ts(name)
                        if dscale[name] is not None:
                            gts = gts * dscale[name]
                        gcols.append(gts.reshape(1, m_cols))
                    D = (
                        jnp.concatenate(gcols, axis=0)
                        if len(gcols) > 1 else gcols[0]
                    )
                    g_leaves = jax.tree.leaves(
                        {"nn": backward_mlp(
                            base.nn, p_shared["nn"], D, nn_res, ones_m1
                        )}
                    )
                    for k in range(npar):
                        g = g_leaves[k]
                        if len(sh_shapes[k]) == 1:
                            g = g.T  # column grad → row store layout
                        g_pad = _pad_to(g, buf_shapes[k])
                        acc_local[k] = (
                            g_pad if acc_local[k] is None
                            else acc_local[k] + g_pad
                        )

            # ---- write-back after the unrolled loop ----------------------
            # select (never arithmetic) against the uninitialized first read
            prev_loss = loss_out[0, 0]
            # gate the CONTRIBUTION by this batch's validity (an empty
            # later batch must not zero earlier batches' accumulated loss);
            # reset at epoch start
            contrib = loss_local * valid
            if deferred_loss:
                # row 0 carries the RAW per-BATCH sse (reset at the batch's
                # first group — for the one-batch case that IS the epoch
                # start); the rmse value and the gradient factor derive
                # from it once the batch is complete (used at do_update;
                # finite at every group, so the discarded non-last
                # computations cannot leak NaN). Row 1 accumulates the
                # EPOCH loss: each batch's finished agg_scale·rmse lands
                # there at its last group (minibatched rmse, late round 4 —
                # the factor is batch-scoped because scl streams the
                # current batch's 1/n and sse resets per batch).
                sse = jnp.where(acc_start, contrib, contrib + prev_loss)
                inv_n0 = scl[1, 1]
                r_val = jnp.sqrt(jnp.maximum(sse * inv_n0, 0.0))
                factor = (agg_scale * inv_n0) / (
                    2.0 * jnp.maximum(r_val, 1e-30)
                )
                loss_val = agg_scale * r_val
                prev_eloss = loss_out[1, 0]
                eloss = jnp.where(
                    chunk_start, jnp.float32(0.0), prev_eloss
                ) + jnp.where(do_update, valid * loss_val, jnp.float32(0.0))
                rows8 = jax.lax.broadcasted_iota(jnp.int32, _PAD, 0)
                loss_out[...] = jnp.where(
                    rows8 == 1,
                    jnp.zeros(_PAD, jnp.float32) + eloss,
                    jnp.zeros(_PAD, jnp.float32) + sse,
                )
            else:
                factor = None
                acc_loss = jnp.where(
                    chunk_start, contrib, contrib + prev_loss
                )
                loss_out[...] = jnp.zeros(_PAD, jnp.float32) + acc_loss

            for k in range(nsite):
                if deferred_site:
                    # merge this group's per-site grads into the carried
                    # accumulator tile; whole-tile update at the last
                    # group (each site's grad lives in exactly one chunk,
                    # and the factor is one scalar — padding rows carry
                    # zero grads and zero state, so the tile-wide update
                    # leaves them zero)
                    sl = sgrad_local[k]
                    sl = jnp.zeros((r_pad, _SITE_LANES), jnp.float32) if sl is None else sl
                    sacc = jnp.where(
                        acc_start, sl, sl + sacc_out[k][...]
                    )
                    sacc_out[k][...] = sacc
                    g_site = factor * sacc if deferred_loss else sacc
                    p_new, m_new, v_new, u_new = update_leaf(
                        pkt[k], mkt[k], vkt[k],
                        ukt[k] if use_u else None, g_site, valid, t_abs,
                    )
                    pst_out[k][...] = jnp.where(do_update, p_new, pkt[k])
                    mst_out[k][...] = jnp.where(do_update, m_new, mkt[k])
                    vst_out[k][...] = jnp.where(do_update, v_new, vkt[k])
                    if use_u:
                        ust_out[k][...] = jnp.where(do_update, u_new, ukt[k])
                else:
                    pst_out[k][...] = pkt[k]
                    mst_out[k][...] = mkt[k]
                    vst_out[k][...] = vkt[k]
                    if use_u:
                        ust_out[k][...] = ukt[k]

            # shared leaves: merge this group's accumulated grads into the
            # carried accumulator (select — never arithmetic — against the
            # uninitialized first read), update at the last group
            for k in range(npar):
                g_pad = acc_local[k]
                acc = jnp.where(
                    acc_start, g_pad, g_pad + acc_out[k][...]
                )
                acc_out[k][...] = acc
                g_upd = factor * acc if deferred_loss else acc
                p_new, m_new, v_new, u_new = update_leaf(
                    pb[k], mb[k], vb[k], ub[k] if use_u else None,
                    g_upd, valid, t_abs,
                )
                psh_out[k][...] = jnp.where(do_update, p_new, pb[k])
                msh_out[k][...] = jnp.where(do_update, m_new, mb[k])
                vsh_out[k][...] = jnp.where(do_update, v_new, vb[k])
                if use_u:
                    ush_out[k][...] = jnp.where(do_update, u_new, ub[k])

            # t: hold t_prev through the epoch, commit t_cur at last chunk
            t_out[...] = jnp.zeros(_PAD, jnp.float32) + jnp.where(
                do_update, t_cur, t_prev
            )

        def full_spec(shape):
            return pl.BlockSpec(
                shape, lambda e, c, _n=len(shape): (0,) * _n,
                memory_space=pltpu.VMEM,
            )

        def chunk_spec(arr):
            blk = (1,) + arr.shape[1:]
            ndim = arr.ndim
            return pl.BlockSpec(
                blk, lambda e, c, _n=ndim: (c,) + (0,) * (_n - 1),
                memory_space=pltpu.VMEM,
            )

        in_specs_fixed = (
            [full_spec(tuple(s.shape)) for s in st_bufs]
            + [full_spec(s) for s in buf_shapes] * (4 if use_u else 3)
            + [full_spec((r_pad, _SITE_LANES))]
            * ((4 if use_u else 3) * nsite)
            + [full_spec(_PAD)]
        )
        n_sacc = nsite if deferred_site else 0
        out_specs = (
            [full_spec(s) for s in buf_shapes] * (4 if use_u else 3)
            + [full_spec((r_pad, _SITE_LANES))]
            * ((4 if use_u else 3) * nsite)
            + [full_spec(s) for s in buf_shapes]
            + [full_spec(_PAD), full_spec(_PAD)]
            + [full_spec((r_pad, _SITE_LANES))] * n_sacc
        )
        out_shape = (
            [jax.ShapeDtypeStruct(s, jnp.float32) for s in buf_shapes]
            * (4 if use_u else 3)
            + [jax.ShapeDtypeStruct((r_pad, _SITE_LANES), jnp.float32)]
            * ((4 if use_u else 3) * nsite)
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in buf_shapes]
            + [jax.ShapeDtypeStruct(_PAD, jnp.float32)] * 2
            + [jax.ShapeDtypeStruct((r_pad, _SITE_LANES), jnp.float32)]
            * n_sacc
        )
        nsets = 4 if use_u else 3

        def run_launch(data_ops, scale_op, sh_sets, sp_sets, t_tile,
                       epochs_l):
            """One pallas_call over ``(epochs_l, n_groups)``; carried
            buffer sets in, carried sets + step delta + loss tile out."""
            x_c, f_c, y_c, m_c = data_ops
            in_specs = (
                [chunk_spec(x_c)]
                + [chunk_spec(a) for a in f_c]
                + [chunk_spec(a) for a in y_c]
                + [chunk_spec(a) for a in m_c]
                + [chunk_spec(scale_op) if minibatch else full_spec(_PAD)]
                + in_specs_fixed
            )
            outs = pl.pallas_call(
                kernel,
                grid=(epochs_l, n_groups),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                interpret=interpret,
            )(
                x_c, *f_c, *y_c, *m_c, scale_op, *st_bufs,
                *sh_sets[0], *sh_sets[1], *sh_sets[2],
                *(sh_sets[3] if use_u else ()),
                *sp_sets[0], *sp_sets[1], *sp_sets[2],
                *(sp_sets[3] if use_u else ()),
                t_tile,
            )
            i = 0
            sh_new = tuple(
                tuple(outs[i + k * npar : i + (k + 1) * npar])
                for k in range(nsets)
            )
            i += nsets * npar
            sp_new = tuple(
                tuple(outs[i + k * nsite : i + (k + 1) * nsite])
                for k in range(nsets)
            )
            i += nsets * nsite
            i += npar  # grad accumulators: scratch, discarded
            t_delta = outs[i]; i += 1
            loss_tile = outs[i]  # (trailing sacc scratch tiles ignored)
            return sh_new, sp_new, t_delta, loss_tile

        sh_sets0 = (tuple(sh_bufs), tuple(shm_bufs), tuple(shv_bufs)) + (
            (tuple(shu_bufs),) if use_u else ()
        )
        sp_sets0 = (tuple(sp_bufs), tuple(spm_bufs), tuple(spv_bufs)) + (
            (tuple(spu_bufs),) if use_u else ()
        )

        if do_shuffle or do_bshuffle:
            # ---- shuffled site minibatches (round 5): one launch per
            # epoch inside a lax.scan — data and the packed per-site
            # tiles are gathered into that epoch's slot order (the XLA
            # path's exact permutation for the same key), the kernel runs
            # with its identity chunk ↔ row mapping, and the tiles are
            # scattered back to canonical site order for the next epoch
            from ..training.epoch import epoch_permutation

            keys = (
                jax.random.split(key, epochs) if epochs > 1 else key[None]
            )
            base_src = jnp.asarray(base_src_np)
            base_dead = jnp.asarray(base_dead_np)

            def body(carry, key_e):
                sh_sets, sp_can, cum = carry
                if do_shuffle:
                    perm = epoch_permutation(key_e, n0)
                else:  # "batches": permute whole site batches
                    bperm = epoch_permutation(key_e, nb)
                    perm = (
                        bperm[:, None] * s_b0
                        + jnp.arange(s_b0, dtype=bperm.dtype)[None, :]
                    ).reshape(-1)
                src = jnp.take(perm, base_src)
                src_full = slot_src_full(src)
                sp_slot = tuple(
                    tuple(tile_to_slots(t, src_full, dead_full_base)
                          for t in s_)
                    for s_ in sp_can
                )
                d = slot_data(src, base_dead)
                data_ops = make_data_ops(
                    d["x"], d["forcing"], d["y"], d["mask"]
                )
                scale_op = make_scale_op(d["mask"], d["y"])
                t_tile = jnp.zeros(_PAD, jnp.float32) + (
                    t0 + cum
                ).astype(jnp.float32)
                sh_new, sp_new, t_delta, loss_tile = run_launch(
                    data_ops, scale_op, sh_sets, sp_slot, t_tile, 1
                )
                sp_can_new = tuple(
                    tuple(tile_to_canonical(t, src_full, dead_full_base)
                          for t in s_)
                    for s_ in sp_new
                )
                cum = cum + jnp.round(t_delta[0, 0]).astype(jnp.int32)
                el = loss_tile[1, 0] if deferred_loss else loss_tile[0, 0]
                return (sh_new, sp_can_new, cum), el

            (sh_out, sp_out, t_cum_i), losses = jax.lax.scan(
                body, (sh_sets0, sp_sets0, jnp.int32(0)), keys
            )
            final_loss = losses[-1]
        else:
            if minibatch and not identity_slots:
                # non-128-multiple batchsize, no shuffle: the STATIC
                # 128-alignment relayout permutes once around a single
                # all-epochs launch
                src_full = slot_src_full(jnp.asarray(base_src_np))
                sp_in = tuple(
                    tuple(tile_to_slots(t, src_full, dead_full_base)
                          for t in s_)
                    for s_ in sp_sets0
                )
                d = slot_data(
                    jnp.asarray(base_src_np), jnp.asarray(base_dead_np)
                )
            else:
                src_full = None
                sp_in = sp_sets0
                d = (
                    slot_data(None, None)
                    if minibatch
                    else dict(
                        x=tensors.x[0],
                        forcing={f: tensors.forcing[f][0]
                                 for f in forcing_names},
                        y={t: tensors.y[t][0] for t in target_names},
                        mask={t: tensors.mask[t][0]
                              for t in target_names},
                    )
                )
            data_ops = make_data_ops(d["x"], d["forcing"], d["y"], d["mask"])
            scale_op = make_scale_op(d["mask"], d["y"])
            sh_out, sp_new, t_delta, loss_tile = run_launch(
                data_ops, scale_op, sh_sets0, sp_in, t_base_tile, epochs
            )
            if src_full is not None:
                sp_out = tuple(
                    tuple(tile_to_canonical(t, src_full, dead_full_base)
                          for t in s_)
                    for s_ in sp_new
                )
            else:
                sp_out = sp_new
            t_cum_i = jnp.round(t_delta[0, 0]).astype(jnp.int32)
            final_loss = (
                loss_tile[1, 0] if deferred_loss else loss_tile[0, 0]
            )
        new_sh, new_shm, new_shv = sh_out[0], sh_out[1], sh_out[2]
        new_sp, new_spm, new_spv = sp_out[0], sp_out[1], sp_out[2]
        if use_u:
            new_shu, new_spu = sh_out[3], sp_out[3]

        def rebuild(sh_list, sp_list):
            tree = jax.tree.unflatten(
                sh_treedef,
                [_from_kernel_buffer(a, s)
                 for a, s in zip(sh_list, sh_shapes)],
            )
            tree = dict(tree)
            tree["globals"] = {
                g: _unpack_site_leaf(sp_list[k], n_sites_total, site_shapes[g])
                for k, g in enumerate(site_names)
            }
            return tree

        new_params = rebuild(new_sh, new_sp)
        new_opt_state = {
            "m": rebuild(new_shm, new_spm),
            "v": rebuild(new_shv, new_spv),
            "t": (t0 + t_cum_i).reshape(1),
        }
        if use_u:
            new_opt_state["u"] = rebuild(new_shu, new_spu)
        # deferred rmse stores the raw sse at row 0 and the finished rmse
        # value at row 1 (the last group's transform) — final_loss above
        if minibatch:
            final_loss = final_loss / nb  # mean over batches (XLA parity)
        return new_params, new_opt_state, state_in, final_loss

    return epoch_fn
