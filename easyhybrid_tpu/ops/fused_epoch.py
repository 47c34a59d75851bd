"""Pallas TPU kernel: a full training epoch as ONE kernel launch.

The XLA scan-epoch path (training/epoch.py) already fuses an epoch into one
program, but each SGD step still costs dozens of small HLO ops (~70 µs/step
for a [16,16] hybrid — fixed op overhead, not FLOPs). This kernel removes
that floor: the batch grid runs INSIDE one Pallas kernel, parameters and
Adam moments live in VMEM output refs carried across the (sequential) grid
steps, each batch streams HBM→VMEM through the automatic block pipeline, and
the fused forward+backward+Adam update is traced into the kernel body with
``jax.value_and_grad`` — the mechanistic model compiles into the same kernel
as the MLP (the "fused NN-forward + mechanistic-model evaluation" north star
of BASELINE.json).

Supported fast path (falls back to the XLA scan epoch otherwise):
SingleNN MLP hybrid (no LSTM), input_batchnorm in {False, "static"},
jnp-pure training loss, Adam/SGD with static hyperparameters.

STATUS (2026-08-16, ~40 bisection experiments against this libtpu build):

* Numerics are validated against the XLA scan epoch in INTERPRET mode
  (tests/test_fused.py: param-exact, multi-epoch Adam bias correction).
* The kernel COMPILES AND RUNS on a real v5e at 18.4k steps/s after a full
  rank-2 redesign. Compile blockers found and fixed:
  - "Not implemented: Offset change" for ANY rank-0 or size-1-rank-1 value
    on a differentiated path -> differentiate the rank-2 forward twin
    (``forward_rank2``) with jax.vjp and hand-computed (1,B) mse cotangents;
    never build a scalar loss in-kernel;
  - the same error for SMEM scalar stores coexisting with AD -> no in-kernel
    loss output;
  - compiler HANG when ``pl.when`` wraps the parameter updates ->
    arithmetic select (``valid`` factor) instead;
  - ``jnp.power(const, traced)`` and ``integer_pow`` -> exp*log / x*x forms.
* REMAINING BLOCKER - silent miscompilation: on-chip, gradients of the
  (1,1)-shaped leaves (global physical params, output bias) come out as
  garbage (e.g. a constant ~-7e5 for the Q10 grad regardless of the
  mechanistic form), while the (F,H)/(1,H) leaf grads track XLA. Neither
  tiling the small leaves over the batch (explicit dot reductions outside
  AD), nor exp*log mechanistic forms, nor a hand-written jax.vjp chain fixes
  the vjp-based kernel; yet a FULLY hand-written backward with the same
  (1,1) aliased buffers (dot-based scalar chain, no jax.vjp) is numerically
  EXACT on-chip (<=1e-4 after 4 sgd steps). Interpret mode is always exact.
  Conclusion: Mosaic codegen bug triggered by vjp-transposed programs
  touching tiny buffers. Because the errors are SILENT, the kernel stays
  opt-in (EASYHYBRID_PALLAS=1 / use_pallas=True); next-round options:
  (a) newer libtpu, (b) generate the backward symbolically per-layer — the
  hand-written dot/elementwise pattern is proven exact on-chip, and
  forward-mode ``jax.jvp`` (no transposition) is VERIFIED exact in-kernel
  (0.1% vs XLA), so mechanistic-model derivatives can come from jvp seeds
  per parameter while the MLP backward uses the hand pattern. Measured
  upside at [16,16]/batch-512 is ~+9% over the XLA scan epoch (18.4k vs
  16.9k steps/s); larger wins need deeper in-kernel pipelining work.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..losses.specs import LoggingLoss
from ..models.hybrid import SingleNNHybridModel
from ..models.nn import MLP

__all__ = ["supports_fused_epoch", "make_fused_epoch", "init_fused_opt_state"]


def _to2d_shape(shape: Tuple[int, ...]) -> Tuple[int, int]:
    if len(shape) == 0:
        return (1, 1)
    if len(shape) == 1:
        return (1, shape[0])
    if len(shape) == 2:
        return shape
    return (int(np.prod(shape[:-1])), shape[-1])


def supports_fused_epoch(model, optimizer_spec, logging: LoggingLoss) -> bool:
    if not isinstance(model, SingleNNHybridModel):
        return False
    if model.nn is not None and not isinstance(model.nn, MLP):
        return False
    if model.nn is not None and model.nn.input_batchnorm is True:
        return False  # trainable running-stats BN mutates state per step
    if logging.extra_loss is not None:
        return False
    # the kernel computes the loss COTANGENT manually (no scalar loss on the
    # AD path — Mosaic cannot lower rank-0 reduction chains); mse only
    if logging.training_loss != "mse":
        return False
    if logging.agg_name not in ("sum", "mean"):
        return False
    if isinstance(optimizer_spec, Mapping):
        return False
    name = (
        optimizer_spec[0]
        if isinstance(optimizer_spec, tuple) and optimizer_spec
        else optimizer_spec
    )
    return isinstance(name, str) and name.lower() in ("adam", "sgd")


def _opt_hyper(optimizer_spec) -> Tuple[str, float]:
    if isinstance(optimizer_spec, str):
        return optimizer_spec.lower(), 0.01
    name = optimizer_spec[0].lower()
    lr = float(optimizer_spec[1]) if len(optimizer_spec) > 1 else 0.01
    return name, lr


def init_fused_opt_state(params) -> Dict[str, Any]:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {
        "m": zeros,
        "v": jax.tree.map(jnp.zeros_like, params),
        "t": jnp.zeros((1,), jnp.int32),
    }


def make_fused_epoch(
    model,
    state,
    optimizer_spec,
    logging: LoggingLoss,
    *,
    shuffle: bool = True,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    interpret: Optional[bool] = None,
):
    """Build ``fn(params, opt_state, state, tensors, key) -> (params,
    opt_state, state, mean_loss)`` — drop-in for ``make_train_epoch`` with
    ``opt_state`` from :func:`init_fused_opt_state`.

    ``state`` (fixed params + frozen norm stats) is baked into the kernel as
    constants; it is returned unchanged.
    """
    opt_name, lr = _opt_hyper(optimizer_spec)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    train_logging = LoggingLoss(
        loss_types=logging.loss_types,
        training_loss=logging.training_loss,
        extra_loss=None,
        agg=logging.agg,
        train_mode=True,
    )

    forcing_names = tuple(model.forcing)
    target_names = tuple(model.targets)

    def forward_rank2(p, state2d, x_b, forcing_b):
        """Spec-driven rank-2 twin of ``SingleNNHybridModel.apply``.

        Numerically identical to ``model.apply`` (verified in interpret mode
        against the XLA path by tests/test_fused.py) but keeps EVERY value on
        the differentiated path at rank ≥ 2 — Mosaic cannot lower the
        cotangent chains of rank-1/rank-0 intermediates ("Offset change").
        Leaves arrive in their 2-D kernel shapes; the user's mechanistic
        function receives (1,B)/(1,1) arrays (broadcasting keeps its math
        unchanged).
        """
        from ..params import scale_param
        from ..models.nn import get_activation

        # static input norm (frozen BatchNorm): state stats as (1,F)
        h = x_b  # (B, F)
        nn_spec = model.nn
        if nn_spec is not None and nn_spec.input_batchnorm:
            norm_state = state2d["nn"]["norm"]
            mean2d, var2d = norm_state["mean"], norm_state["var"]
            h = (h - mean2d) * jax.lax.rsqrt(var2d + 1e-5)
            norm_params = p.get("nn", {}).get("norm")
            if norm_params is not None:
                h = h * norm_params["scale"] + norm_params["bias"]
        if nn_spec is not None:
            for layer, lp in zip(nn_spec.layers, p["nn"]["layers"]):
                h = jnp.dot(h, lp["w"], preferred_element_type=jnp.float32)
                h = h + lp["b"]  # (1,H) broadcasts
                h = get_activation(layer.activation)(h)
        nn_out = h  # (B, P)

        all_params = {}
        for idx, name in enumerate(model.neural_param_names):
            col = nn_out[:, idx : idx + 1].T  # (1, B) — rank-2 slice
            if model.scale_nn_outputs:
                lo = model.parameters.lower_of(name)
                up = model.parameters.upper_of(name)
                col = scale_param(col, lo, up)
            all_params[name] = col
        for g in model.global_param_names:
            lo = model.parameters.lower_of(g)
            up = model.parameters.upper_of(g)
            all_params[g] = scale_param(p["globals"][g], lo, up)  # (1,1)
        for f in model.fixed_param_names:
            all_params[f] = state2d["fixed"][f]  # (1,1)

        from ..models.hybrid import _call_mechanistic

        outputs = _call_mechanistic(
            model.mechanistic_model, {**forcing_b, **all_params}
        )
        return outputs

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch_fn(params, opt_state, state_in, tensors, key):
        from jax.tree_util import tree_flatten_with_path

        path_leaves, treedef = tree_flatten_with_path(params)
        leaf_paths = [
            "/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in path_leaves
        ]
        leaves = [l for _, l in path_leaves]
        m_leaves = jax.tree.flatten(opt_state["m"])[0]
        v_leaves = jax.tree.flatten(opt_state["v"])[0]
        orig_shapes = [l.shape for l in leaves]
        shapes2d = [_to2d_shape(s) for s in orig_shapes]
        # "broadcast leaves" (rank ≤ 1 originals: biases, BN affine, globals)
        # enter the differentiated path PRE-TILED over the batch so their AD
        # cotangents are full-size elementwise arrays; the reduction back to
        # the leaf shape is an explicit dot OUTSIDE AD. Motivation: this
        # libtpu's Mosaic silently miscompiles AD-generated reductions into
        # small buffers (see module docstring).
        #   mode None      — 2-D weight, used directly
        #   mode "global"  — (1,1) leaf under globals/ → tile (1, B)
        #   mode "bias"    — (1,n) leaf → tile (B, n)
        tile_mode = [
            None
            if len(orig_shapes[k]) >= 2
            else ("global" if leaf_paths[k].startswith("globals") else "bias")
            for k in range(len(leaves))
        ]
        # state (fixed params, frozen norm stats) rides along as read-only
        # kernel inputs — pallas forbids captured array constants
        st_leaves, st_treedef = jax.tree.flatten(state_in)
        st_shapes = [np.shape(l) for l in st_leaves]
        st_shapes2d = [_to2d_shape(s) for s in st_shapes]
        nst = len(st_leaves)

        num_batches, batch = tensors.weight.shape

        x = tensors.x
        forcing = [tensors.forcing[f] for f in forcing_names]
        ys = [tensors.y[t] for t in target_names]
        masks = [tensors.mask[t] for t in target_names]

        if shuffle and num_batches > 1:
            # identical permutation + packed gather as the XLA scan epoch
            # (training/epoch.py) so the two paths realize the same order
            from ..training.epoch import epoch_permutation, shuffle_epoch_tensors

            perm = epoch_permutation(key, num_batches * batch)
            shuffled = shuffle_epoch_tensors(tensors, perm)
            x = shuffled.x
            forcing = [shuffled.forcing[f] for f in forcing_names]
            ys = [shuffled.y[t] for t in target_names]
            masks = [shuffled.mask[t] for t in target_names]

        # TPU block shapes: the last two dims must divide (8, 128) or equal
        # the array dims. (NB, B) streams become (NB, 1, B) so the per-step
        # block (1, 1, B) is legal; the kernel reads [0, 0] -> (B,).
        def as3d(a):
            return a.reshape(a.shape[0], 1, a.shape[1])

        forcing = [as3d(f) for f in forcing]
        ys = [as3d(y) for y in ys]
        masks = [as3d(m) for m in masks]

        nf, nt, npar = len(forcing), len(target_names), len(leaves)

        def kernel(*refs):
            # params/moments are input_output_aliased: the output refs start
            # with the input contents, carry across the (sequential) grid and
            # need no i==0 copy; the aliased input refs are unused.
            t0_ref = refs[0]
            idx = 1
            x_ref = refs[idx]; idx += 1
            f_refs = refs[idx : idx + nf]; idx += nf
            y_refs = refs[idx : idx + nt]; idx += nt
            m_refs_in = refs[idx : idx + nt]; idx += nt
            st_refs = refs[idx : idx + nst]; idx += nst
            idx += 3 * npar  # aliased param/m/v input refs (unused)
            p_out = refs[idx : idx + npar]; idx += npar
            am_out = refs[idx : idx + npar]; idx += npar
            av_out = refs[idx : idx + npar]; idx += npar

            i = pl.program_id(0)

            # streams stay RANK-2 ((1,B)) end to end: Mosaic mishandles
            # rank-1/rank-0 values on differentiated paths (bisection)
            x_b = x_ref[0]
            forcing_b = {f: f_refs[j][0] for j, f in enumerate(forcing_names)}
            y_b = {t: y_refs[j][0] for j, t in enumerate(target_names)}
            mask_b = {t: m_refs_in[j][0] for j, t in enumerate(target_names)}
            # state leaves stay in 2-D kernel shapes (rank-2 discipline)
            state2d = jax.tree.unflatten(st_treedef, [r[...] for r in st_refs])

            def apply_targets(vals_in):
                """Fused forward returning per-target (1,B) predictions.

                The kernel differentiates THIS (via jax.vjp with rank-2
                cotangents) rather than a scalar loss; broadcast leaves are
                already tiled, so every cotangent in the backward is a
                full-size elementwise array or a weight dot — the two forms
                this Mosaic build compiles correctly.
                """
                p = jax.tree.unflatten(treedef, list(vals_in))
                outputs = forward_rank2(p, state2d, x_b, forcing_b)
                return tuple(
                    outputs[t].reshape(1, -1) for t in target_names
                )

            bsz = x_b.shape[0]
            vals_in = []
            for k in range(npar):
                v = p_out[k][...]
                if tile_mode[k] == "global":
                    v = jnp.broadcast_to(v[:, :1], (1, bsz))
                elif tile_mode[k] == "bias":
                    v = jnp.broadcast_to(v, (bsz, v.shape[1]))
                vals_in.append(v)
            preds, vjp_fn = jax.vjp(apply_targets, vals_in)

            # manual masked-mse cotangent per target:
            # dL/dpred_t = agg_scale * 2 * (pred_t - y_t) * m_t / n_t
            agg_scale = (
                1.0 / len(target_names) if train_logging.agg_name == "mean" else 1.0
            )
            cots = tuple(
                (2.0 * agg_scale / jnp.maximum(jnp.sum(mask_b[t]), 1.0))
                * (preds[j] - y_b[t])
                * mask_b[t]
                for j, t in enumerate(target_names)
            )
            raw_grads = vjp_fn(cots)[0]
            # reduce tiled-leaf cotangents back to leaf shapes with EXPLICIT
            # dots (outside AD): ones(1,B) @ (B,n) and (1,B) @ ones(B,1)
            ones_b1 = jnp.ones((bsz, 1), jnp.float32)
            ones_1b = jnp.ones((1, bsz), jnp.float32)
            grads = []
            for k in range(npar):
                g = raw_grads[k]
                if tile_mode[k] == "global":
                    g = jax.lax.dot_general(
                        g, ones_b1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1,1)
                elif tile_mode[k] == "bias":
                    g = jax.lax.dot_general(
                        ones_1b, g, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (1,n)
                grads.append(g)

            # empty-batch skip via ARITHMETIC selection (pl.when around the
            # updates hangs this Mosaic build's compiler — final bisection
            # finding): valid=0 leaves params and moments bit-identical.
            valid = (
                (sum(jnp.sum(m) for m in mask_b.values()) > 0.0).astype(
                    jnp.float32
                )
                if mask_b
                else jnp.float32(1.0)
            )

            t = (t0_ref[0, 0] + i + 1).astype(jnp.float32)
            # b^t as exp(t·log b): Mosaic does not lower jnp.power with
            # a traced exponent
            b1_t = jnp.exp(t * np.log(b1).astype(np.float32))
            b2_t = jnp.exp(t * np.log(b2).astype(np.float32))
            for k in range(npar):
                g = grads[k]
                if opt_name == "sgd":
                    p_out[k][...] = p_out[k][...] - (valid * lr) * g
                    # aliased outputs must be written in the kernel
                    am_out[k][...] = am_out[k][...]
                    av_out[k][...] = av_out[k][...]
                else:
                    m_old = am_out[k][...]
                    v_old = av_out[k][...]
                    m_new = b1 * m_old + (1.0 - b1) * g
                    v_new = b2 * v_old + (1.0 - b2) * g * g
                    m_sel = m_old + valid * (m_new - m_old)
                    v_sel = v_old + valid * (v_new - v_old)
                    am_out[k][...] = m_sel
                    av_out[k][...] = v_sel
                    m_hat = m_sel / (1.0 - b1_t)
                    v_hat = v_sel / (1.0 - b2_t)
                    p_out[k][...] = p_out[k][...] - (valid * lr) * m_hat / (
                        jnp.sqrt(v_hat) + eps
                    )
            # NOTE: the batch loss is intentionally NOT emitted — an SMEM
            # scalar store in a kernel that also runs autodiff trips Mosaic
            # ("Not implemented: Offset change"). Loss reporting comes from
            # the jitted evaluator, which the trainer runs per eval point.

        # ---- specs ----
        def batch_spec(arr):
            blk = (1,) + arr.shape[1:]
            ndim = arr.ndim
            return pl.BlockSpec(
                blk,
                lambda i, _n=ndim: (i,) + (0,) * (_n - 1),
                memory_space=pltpu.VMEM,
            )

        def full_spec(shape):
            return pl.BlockSpec(
                shape,
                lambda i, _n=len(shape): (0,) * _n,
                memory_space=pltpu.VMEM,
            )

        leaves2d = [l.reshape(s) for l, s in zip(leaves, shapes2d)]
        m2d = [l.reshape(s) for l, s in zip(m_leaves, shapes2d)]
        v2d = [l.reshape(s) for l, s in zip(v_leaves, shapes2d)]
        st2d = [
            jnp.asarray(l, jnp.float32).reshape(s)
            for l, s in zip(st_leaves, st_shapes2d)
        ]

        in_specs = (
            [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
            + [batch_spec(x)]
            + [batch_spec(f) for f in forcing]
            + [batch_spec(y) for y in ys]
            + [batch_spec(m) for m in masks]
            + [full_spec(s) for s in st_shapes2d]
            + [full_spec(s) for s in shapes2d] * 3
        )
        out_specs = [full_spec(s) for s in shapes2d] * 3
        out_shape = [jax.ShapeDtypeStruct(s, jnp.float32) for s in shapes2d] * 3

        t0 = opt_state["t"].reshape(1, 1)
        # alias the param/moment inputs onto the outputs (in-place update)
        first_param_operand = 2 + nf + 2 * nt + nst
        aliases = {first_param_operand + j: j for j in range(3 * npar)}
        outs = pl.pallas_call(
            kernel,
            grid=(num_batches,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            input_output_aliases=aliases,
        )(t0, x, *forcing, *ys, *masks, *st2d, *leaves2d, *m2d, *v2d)

        new_p2d = outs[:npar]
        new_m2d = outs[npar : 2 * npar]
        new_v2d = outs[2 * npar : 3 * npar]
        # loss is not computed in-kernel (see NOTE above); the trainer reads
        # metrics from the evaluator
        loss_sum = jnp.full((), jnp.nan, jnp.float32)

        new_params = jax.tree.unflatten(
            treedef, [p.reshape(s) for p, s in zip(new_p2d, orig_shapes)]
        )
        new_opt_state = {
            "m": jax.tree.unflatten(
                treedef, [p.reshape(s) for p, s in zip(new_m2d, orig_shapes)]
            ),
            "v": jax.tree.unflatten(
                treedef, [p.reshape(s) for p, s in zip(new_v2d, orig_shapes)]
            ),
            "t": opt_state["t"] + num_batches,
        }
        return new_params, new_opt_state, state_in, loss_sum

    return epoch_fn
