"""Jit-compiled training epoch and evaluation programs.

TPU-native redesign of the reference's per-batch host loop
(reference: src/training/epoch.jl — ``run_epoch!`` :13-33,
``collect_dim_data`` :1-11, ``evaluate_epoch`` :53-66): instead of a Julia
``for`` loop doing a host→device transfer plus a ``single_train_step!``
launch per batch, the whole epoch is ONE XLA program:

* the padded epoch tensors live on device across epochs;
* an in-program PRNG permutation reshuffles samples (padding rows carry zero
  weight, so wherever they land they contribute nothing);
* ``lax.scan`` walks the ``(num_batches, batch, ...)`` leading axis carrying
  ``(params, opt_state, nn_state)``;
* each step is value_and_grad(fused hybrid forward) + optax update — all
  fused by XLA, zero dispatch overhead per batch.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..data.loaders import EpochTensors
from ..losses.compute import compute_loss
from ..losses.specs import LoggingLoss

__all__ = [
    "make_train_epoch",
    "make_evaluator",
    "make_dual_evaluator",
    "make_loss_fn",
    "can_skip_empty_guard",
]


def _tree_gather(tree, idx):
    """Gather leading-axis samples across a pytree of flat arrays."""
    return jax.tree.map(lambda a: a[idx], tree)


def epoch_permutation(key, n: int):
    """Uniform random permutation of ``n`` samples via one key-sort.

    Used by BOTH the XLA scan epoch and the fused Pallas epoch so the two
    paths realize the identical sample order for a given key. Batches over
    leading key dims: ``jax.vmap(epoch_permutation, (0, None))`` sorts all
    epochs' keys in ONE fused sort — much cheaper than per-epoch sorts."""
    return jnp.argsort(jax.random.uniform(key, (n,)))


def shuffle_epoch_tensors(tensors: EpochTensors, perm) -> EpochTensors:
    """Apply a sample permutation with ONE packed gather.

    Seven separate per-leaf gathers cost ~4× more than a single gather of
    the concatenated ``(n_samples, total_features)`` matrix (narrow rank-1
    gathers waste the vector lanes), so all float32 per-sample leaves are
    packed column-wise, gathered once, and sliced back out. Non-f32 leaves
    (none in the standard pipeline) fall back to per-leaf gathers."""
    num_batches, batch = tensors.weight.shape
    n = num_batches * batch
    data = (tensors.x, tensors.forcing, tensors.y, tensors.mask, tensors.weight)
    leaves, treedef = jax.tree.flatten(data)
    flat = [l.reshape((n, -1)) for l in leaves]
    if all(f.dtype == jnp.float32 for f in flat):
        packed = jnp.concatenate(flat, axis=1) if len(flat) > 1 else flat[0]
        packed = packed[perm]
        out, off = [], 0
        for l, f in zip(leaves, flat):
            d = f.shape[1]
            col = packed[:, off : off + d]
            out.append(col.reshape((num_batches, batch) + l.shape[2:]))
            off += d
    else:
        out = [
            f[perm].reshape((num_batches, batch) + l.shape[2:])
            for l, f in zip(leaves, flat)
        ]
    x, forcing, y, mask, weight = jax.tree.unflatten(treedef, out)
    return EpochTensors(
        x=x,
        forcing=forcing,
        y=y,
        mask=mask,
        weight=weight,
        n_samples=tensors.n_samples,
    )


def _per_shard_shuffle(tensors: EpochTensors, key, mesh) -> EpochTensors:
    """Shard-local sample shuffle: each device permutes ONLY the samples it
    already holds (its slice of every batch), so the reshuffle compiles to
    pure local gathers — zero cross-chip collectives, unlike a global
    permutation which is an all-to-all over ICI every epoch.

    Each shard holds num_batches × (batch/n_dev) samples, fully permuted
    with a per-device key (same quality as a full shuffle within the shard;
    sample-to-shard assignment stays fixed). TPU-native addition — the
    reference has no distributed layer (SURVEY.md §2.10)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    data = (tensors.x, tensors.forcing, tensors.y, tensors.mask, tensors.weight)

    def spec_of(a):
        return P(None, axis) if jnp.ndim(a) >= 2 else P()

    data_specs = jax.tree.map(spec_of, data)

    def local(block, k):
        k = jax.random.fold_in(k, lax.axis_index(axis))
        nb, bloc = block[-1].shape  # weight: (num_batches, batch/n_dev)
        perm = jax.random.permutation(k, nb * bloc)

        def shuf(a):
            flat = a.reshape((nb * bloc,) + a.shape[2:])
            return flat[perm].reshape((nb, bloc) + a.shape[2:])

        return jax.tree.map(shuf, block)

    x, forcing, y, mask, weight = shard_map(
        local, mesh=mesh, in_specs=(data_specs, P()), out_specs=data_specs
    )(data, key)
    return EpochTensors(
        x=x,
        forcing=forcing,
        y=y,
        mask=mask,
        weight=weight,
        n_samples=tensors.n_samples,
    )


def can_skip_empty_guard(tensors: EpochTensors) -> bool:
    """True when no shuffled batch can consist entirely of invalid samples,
    so the per-step empty-batch guard (three tree-selects) is provably dead.

    A sample is invalid if every target mask is zero (padding or all-NaN
    targets). If fewer such samples exist than one batch holds, every batch
    contains at least one valid sample under any permutation."""
    import numpy as np

    if not tensors.mask:
        return False
    batch = tensors.batch_size
    valid_any = None
    for m in tensors.mask.values():
        m = np.asarray(m)
        per_sample = m.reshape(m.shape[0] * m.shape[1], -1).sum(axis=-1) > 0
        valid_any = per_sample if valid_any is None else (valid_any | per_sample)
    n_invalid = int((~valid_any).sum())
    return n_invalid < batch


def make_train_epoch(
    model,
    logging: LoggingLoss,
    optimizer,
    *,
    shuffle: bool = True,
    jit: bool = True,
    epochs_per_call: int = 1,
    skip_empty_guard: bool = False,
    remat: bool = False,
    mesh=None,
) -> Callable:
    """Build ``epoch_fn(params, opt_state, state, tensors, key) ->
    (params, opt_state, state, mean_batch_loss)``.

    ``tensors`` is an :class:`EpochTensors`; its ``(num_batches, batch)``
    leading shape is static per compilation.

    ``epochs_per_call > 1`` runs that many full (re-shuffled) epochs inside
    ONE compiled program via an outer ``lax.scan`` — amortizes the host
    dispatch that otherwise costs ~25% at small model sizes; the returned
    loss is the last epoch's mean batch loss.
    """
    train_logging = LoggingLoss(
        loss_types=logging.loss_types,
        training_loss=logging.training_loss,
        extra_loss=logging.extra_loss,
        agg=logging.agg,
        train_mode=True,
    )

    def loss_for_batch(params, state, batch):
        return compute_loss(model, params, state, batch, train_logging)

    if remat:
        # rematerialize the fused forward in the backward pass: trades
        # recompute FLOPs for activation memory (HBM) — for very large NNs
        # or very long sequence windows
        loss_for_batch = jax.checkpoint(loss_for_batch)

    grad_fn = jax.value_and_grad(loss_for_batch, has_aux=True)

    def one_epoch(params, opt_state, state, tensors: EpochTensors, key, perm=None):
        num_batches = tensors.weight.shape[0]
        batch = tensors.weight.shape[1]

        if shuffle is True and num_batches > 1:
            # full sample-level reshuffle (reference DataLoader parity):
            # one key-sort permutation + ONE packed gather over the epoch
            # data — see shuffle="batches" for the gather-free variant
            if perm is None:
                perm = epoch_permutation(key, num_batches * batch)
            tensors = shuffle_epoch_tensors(tensors, perm)
        elif shuffle == "per_shard" and num_batches > 1:
            if mesh is None:
                raise ValueError("shuffle='per_shard' needs a device mesh")
            tensors = _per_shard_shuffle(tensors, key, mesh)
        elif shuffle == "batches" and num_batches > 1:
            # permute only the batch ORDER: one (num_batches,) gather instead
            # of a full sample gather. Sample-to-batch assignment stays fixed
            # (trades shuffle quality for ~20% epoch speed on small models).
            # epoch_permutation (key-sort), NOT jax.random.permutation, so the
            # fused Pallas epoch realizes the identical batch order per key.
            perm = epoch_permutation(key, num_batches)
            tensors = EpochTensors(
                x=_tree_gather(tensors.x, perm),
                forcing=_tree_gather(tensors.forcing, perm),
                y=_tree_gather(tensors.y, perm),
                mask=_tree_gather(tensors.mask, perm),
                weight=tensors.weight[perm],
                n_samples=tensors.n_samples,
            )

        def body(carry, slice_):
            params, opt_state, state = carry
            x_b, forcing_b, y_b, mask_b = slice_
            batch_data = ((x_b, forcing_b), (y_b, mask_b))
            (loss, new_state), grads = grad_fn(params, state, batch_data)

            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax_apply_updates(params, updates)

            if skip_empty_guard or not mask_b:
                # proven at build time that no batch can be fully masked
                # (see can_skip_empty_guard) — drop the three tree-selects
                return (new_params, new_opt_state, new_state), loss

            # skip all-masked batches (parity: isemptybatch, epoch.jl:35-37):
            # keep params/opt_state/state untouched when no valid targets.
            any_valid = sum(jnp.sum(m) for m in mask_b.values()) > 0
            params = jax.tree.map(
                lambda new, old: jnp.where(any_valid, new, old), new_params, params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(any_valid, new, old),
                new_opt_state,
                opt_state,
            )
            state = jax.tree.map(
                lambda new, old: jnp.where(any_valid, new, old), new_state, state
            )
            return (params, opt_state, state), jnp.where(any_valid, loss, 0.0)

        xs = (tensors.x, tensors.forcing, tensors.y, tensors.mask)
        (params, opt_state, state), losses = lax.scan(
            body, (params, opt_state, state), xs, unroll=min(4, num_batches)
        )
        return params, opt_state, state, jnp.mean(losses)

    if epochs_per_call <= 1:
        epoch_fn = one_epoch
    else:

        def epoch_fn(params, opt_state, state, tensors, key):
            keys = jax.random.split(key, epochs_per_call)
            num_batches, batch = tensors.weight.shape
            if shuffle is True and num_batches > 1:
                # generate ALL epochs' permutations in one fused batched
                # key-sort — E-fold cheaper than a sort inside every epoch
                perms = jax.vmap(
                    lambda k: epoch_permutation(k, num_batches * batch)
                )(keys)
                xs = (keys, perms)
            else:
                xs = (keys, None)

            def outer(carry, sl):
                k, perm = sl
                p, o, s = carry
                p, o, s, loss = one_epoch(p, o, s, tensors, k, perm=perm)
                return (p, o, s), loss

            (params, opt_state, state), losses = lax.scan(
                outer, (params, opt_state, state), xs
            )
            return params, opt_state, state, losses[-1]

    if jit:
        epoch_fn = jax.jit(epoch_fn, donate_argnums=(0, 1, 2))
    return epoch_fn


def optax_apply_updates(params, updates):
    """optax.apply_updates with dtype preservation."""
    return jax.tree.map(
        lambda p, u: (p + u.astype(p.dtype)) if u is not None else p,
        params,
        updates,
        is_leaf=lambda x: x is None,
    )


def make_evaluator(
    model,
    logging: LoggingLoss,
    *,
    jit: bool = True,
    with_outputs: bool = False,
) -> Callable:
    """Build ``eval_fn(params, state, batch) -> metrics`` (or
    ``(metrics, outputs)``) over a full ``((x, forcing), (y, mask))`` split
    in test mode. Parity: ``evaluate_acc`` (train.jl:347-355) — but jitted
    and device-resident; only scalar metrics come back to host per epoch.
    """
    eval_logging = LoggingLoss(
        loss_types=logging.loss_types,
        training_loss=logging.training_loss,
        extra_loss=logging.extra_loss,
        agg=logging.agg,
        train_mode=False,
    )

    def eval_fn(params, state, batch):
        metrics, _, outputs = compute_loss(model, params, state, batch, eval_logging)
        if with_outputs:
            return metrics, outputs
        return metrics

    if jit:
        eval_fn = jax.jit(eval_fn)
    return eval_fn


def make_dual_evaluator(model, logging: LoggingLoss, *, jit: bool = True) -> Callable:
    """One compiled program evaluating BOTH splits with outputs:
    ``eval_fn(params, state, train_batch, val_batch) ->
    ((m_tr, out_tr), (m_va, out_va))``.

    Replaces four separate jit programs (metrics-only × 2 batch shapes +
    with-outputs × 2) with ONE — the single biggest lever on cold
    wall-clock-to-MSE, which is compile-dominated on a remote-compile TPU.
    Outputs stay on device unless fetched, so computing them always is free
    for callers that only read the metric scalars."""
    eval_logging = LoggingLoss(
        loss_types=logging.loss_types,
        training_loss=logging.training_loss,
        extra_loss=logging.extra_loss,
        agg=logging.agg,
        train_mode=False,
    )

    def eval_fn(params, state, train_batch, val_batch):
        m_tr, _, out_tr = compute_loss(model, params, state, train_batch, eval_logging)
        m_va, _, out_va = compute_loss(model, params, state, val_batch, eval_logging)
        return (m_tr, out_tr), (m_va, out_va)

    if jit:
        eval_fn = jax.jit(eval_fn)
    return eval_fn


def make_loss_fn(model, logging: LoggingLoss) -> Callable:
    """Scalar loss closure ``f(params, state, batch) -> (loss, new_state)``
    for external optimizers (L-BFGS path; parity: ``_build_optim_loss``,
    train_optimization.jl:121-133)."""
    train_logging = LoggingLoss(
        loss_types=logging.loss_types,
        training_loss=logging.training_loss,
        extra_loss=logging.extra_loss,
        agg=logging.agg,
        train_mode=True,
    )

    def loss_fn(params, state, batch):
        return compute_loss(model, params, state, batch, train_logging)

    return loss_fn
