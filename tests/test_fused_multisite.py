"""Multisite fused kernel: interpret-mode parity vs the XLA scan epoch.

The kernel's differentiation/update math must match the XLA path exactly
(the runtime exactness gate enforces this on-chip; these tests enforce it
in interpret mode where there is no MXU rounding asymmetry).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import easyhybrid_tpu as eh
from easyhybrid_tpu.data.loaders import build_epoch_tensors
from easyhybrid_tpu.data.prepare import HybridData
from easyhybrid_tpu.losses.specs import LoggingLoss
from easyhybrid_tpu.ops.fused_epoch import init_fused_opt_state
from easyhybrid_tpu.ops.fused_multisite import (
    make_fused_multisite_epoch,
    supports_fused_multisite,
)
from easyhybrid_tpu.training.epoch import make_train_epoch


def _rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def _make(S=200, N=10, nan_frac=0.1, seed=0, hidden=(8, 8), batchsize=None,
          site_idx=False):
    base = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=list(hidden), activation="swish",
        scale_nn_outputs=True,
    )
    model = eh.MultiSiteHybridModel(base, n_sites=S, share_nn=True)
    # shared fixture builder (identity _site_idx, the layout the fused
    # kernel's chunk<->packed-row check requires)
    from easyhybrid_tpu.data.synthetic import gen_multisite_arrays

    data = gen_multisite_arrays(
        S, N, seed=seed, nan_frac=nan_frac, site_idx=site_idx
    )
    params, state = model.init(jax.random.PRNGKey(3))
    tensors = jax.tree.map(
        jnp.asarray, build_epoch_tensors(data, batchsize or S)
    )
    return model, params, state, tensors


@pytest.mark.parametrize(
    "opt,loss,agg",
    [
        (("adam", 0.01), "mse", "sum"),
        (("sgd", 0.05), "mae", "mean"),
        (("adamw", 0.01, 0.9, 0.999, 1e-8), "mse", "mean"),
        (("rmsprop", 0.005), "mse", "sum"),
        (("adam", 0.01), "nseLoss", "sum"),
        (("sgd", 0.05), "nseLoss", "mean"),
        # late-round-3 two-slot optimizers flow through the shared
        # make_update_leaf — one multisite case each
        (("lion", 0.003), "mse", "sum"),
        (("nadam", 0.01), "mse", "mean"),
        (("adagrad", 0.02), "mae", "sum"),
        (("adamax", 0.01), "mse", "sum"),
    ],
)
def test_multisite_fused_matches_xla_epoch(opt, loss, agg):
    model, params, state, tensors = _make()
    logging = LoggingLoss(training_loss=loss, loss_types=(loss,), agg=agg)
    assert supports_fused_multisite(model, opt, logging, tensors)

    epochs = 3
    fused = make_fused_multisite_epoch(
        model, state, opt, logging, shuffle=False,
        epochs_per_call=epochs, interpret=True,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )

    from easyhybrid_tpu.training.optimizers import resolve_optimizer

    name = opt[0]
    optimizer = optax.flatten(
        resolve_optimizer(opt)
        if name != "adamw"
        else optax.adamw(opt[1], b1=opt[2], b2=opt[3], eps=opt[4])
    )
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=False, epochs_per_call=epochs
    )
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(0),
    )

    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_f)[0],
        jax.tree_util.tree_flatten_with_path(p_x)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=str(path),
        )
    assert int(o_f["t"][0]) == epochs


def test_multisite_fused_site_count_not_multiple_of_128():
    """Sites that do not fill the last packed row (and N not a multiple of
    8) still match the XLA epoch — padding contributes nothing."""
    model, params, state, tensors = _make(S=150, N=7)
    logging = LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_multisite_epoch(
        model, state, ("adam", 0.01), logging, epochs_per_call=2,
        interpret=True,
    )
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    optimizer = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=False, epochs_per_call=2
    )
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(p_f["globals"]["Q10"]), np.asarray(p_x["globals"]["Q10"]),
        atol=5e-5, rtol=5e-4,
    )
    for a, b in zip(jax.tree.leaves(p_f["nn"]), jax.tree.leaves(p_x["nn"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )


@pytest.mark.parametrize("spec_fn", [lambda: eh.pinball(0.3),
                                     lambda: eh.huber(0.7),
                                     lambda: eh.pinball(0.9, normalize="sum")])
def test_multisite_fused_elementwise_loss_matches_xla(spec_fn):
    """Declarative ElementwiseLoss (pinball/huber) in the multisite kernel:
    chunk-local jvp differentiation matches jax.grad on the XLA epoch,
    including the NaN mask and the precomputed mean/sum normalization."""
    spec = spec_fn()
    model, params, state, tensors = _make(S=150, N=7)
    logging = LoggingLoss(training_loss=spec, loss_types=("mse",))
    assert supports_fused_multisite(model, ("adam", 0.01), logging, tensors)
    fused = make_fused_multisite_epoch(
        model, state, ("adam", 0.01), logging, epochs_per_call=2,
        interpret=True,
    )
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    optimizer = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=False, epochs_per_call=2
    )
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_f)[0],
        jax.tree_util.tree_flatten_with_path(p_x)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=str(path),
        )


def test_multisite_supports_envelope():
    model, params, state, tensors = _make(S=64, N=4)
    logging = LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_multisite(model, ("adam", 0.01), logging, tensors)
    # minibatched sites with a batch NOT a multiple of 128 lanes joined
    # the envelope in round 5 (per-batch slot padding); unknown shuffle
    # modes are still out
    from easyhybrid_tpu.data.prepare import HybridData

    small = jax.tree.map(jnp.asarray, build_epoch_tensors(
        HybridData(
            x=np.zeros((64, 4, 2), np.float32),
            forcing={"ta": np.zeros((64, 4), np.float32)},
            y={"reco": np.ones((64, 4), np.float32)},
        ), 32,
    ))
    assert supports_fused_multisite(model, ("adam", 0.01), logging, small)
    assert supports_fused_multisite(
        model, ("adam", 0.01), logging, small, shuffle=True
    )
    assert not supports_fused_multisite(
        model, ("adam", 0.01), logging, small, shuffle="per_shard"
    )
    # rmse joined the envelope in round 4 (deferred-factor scheme,
    # single target); batch-statistic losses stay out
    rmse = LoggingLoss(training_loss="rmse", loss_types=("rmse",))
    assert supports_fused_multisite(model, ("adam", 0.01), rmse, tensors)
    # batch-statistic losses need full-batch PREDICTION moments: XLA path
    pear = LoggingLoss(training_loss="pearsonLoss", loss_types=("mse",))
    assert not supports_fused_multisite(model, ("adam", 0.01), pear, tensors)
    # chunk-local losses joined the envelope (late round 3)
    nse = LoggingLoss(training_loss="nseLoss", loss_types=("nseLoss",))
    assert supports_fused_multisite(model, ("adam", 0.01), nse, tensors)
    pb = LoggingLoss(training_loss=eh.pinball(0.5), loss_types=("mse",))
    assert supports_fused_multisite(model, ("adam", 0.01), pb, tensors)
    # share_nn=False has per-site NN weights: outside the envelope
    import dataclasses

    no_share = dataclasses.replace(model, share_nn=False)
    assert not supports_fused_multisite(
        no_share, ("adam", 0.01), logging, tensors
    )
    # plain single-series models are the generic kernel's job
    assert not supports_fused_multisite(
        model.base, ("adam", 0.01), logging, tensors
    )
    # unsupported optimizer spec
    assert not supports_fused_multisite(model, "lbfgs", logging, tensors)


def test_multisite_fused_multi_epoch_counter_and_loss_decreases():
    model, params, state, tensors = _make(S=128, N=8, nan_frac=0.0)
    logging = LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_multisite_epoch(
        model, state, ("adam", 0.02), logging, epochs_per_call=10,
        interpret=True,
    )
    opt_state = init_fused_opt_state(params)
    p, o, _, l1 = fused(
        jax.tree.map(jnp.copy, params), opt_state, state, tensors,
        jax.random.PRNGKey(0),
    )
    p, o, _, l2 = fused(p, o, state, tensors, jax.random.PRNGKey(1))
    assert int(o["t"][0]) == 20
    assert float(l2) < float(l1)


def test_multisite_train_uses_fused_path(tmp_path):
    """Full train() on a MultiSiteHybridModel selects the multisite kernel
    (forced candidate on CPU; interpret mode) and surfaces epoch_path."""
    base = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[8, 8], activation="swish", scale_nn_outputs=True,
    )
    from easyhybrid_tpu.parallel.multisite import prepare_multisite_data

    df = eh.gen_rbq10_data(400, seed=4)
    df["site"] = np.repeat(np.arange(8), 50)
    ms = eh.MultiSiteHybridModel(base, n_sites=8, share_nn=True)
    data = prepare_multisite_data(base, df, "site")
    res = eh.train(
        ms, data, nepochs=3, show_progress=False, split_data_at=0.75,
        use_pallas=True,
    )
    assert np.isfinite(res.best_loss)
    assert res.epoch_path == "fused_pallas_multisite"
    assert res.loop_mode in ("eager", "deferred")
    assert res.params["globals"]["Q10"].shape == (8, 1)


def test_epoch_path_surfaced_in_results_and_stream(tmp_path):
    """Default CPU run reports the XLA engine in TrainResults and the JSONL
    stream meta record."""
    base = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"], targets=["reco"],
        mechanistic_model=_rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[8], activation="swish", scale_nn_outputs=True,
    )
    df = eh.gen_rbq10_data(300, seed=1)
    res = eh.train(
        base, df, nepochs=2, batchsize=64, show_progress=False,
        save_training=True, output_folder=str(tmp_path), model_name="pathrun",
    )
    assert res.epoch_path == "xla_scan"
    # save_training alone no longer forces the readback loop (round 3)
    assert res.loop_mode == "deferred"
    from easyhybrid_tpu.plotting.live import read_metric_stream

    records = read_metric_stream(res.paths.metrics_jsonl, include_meta=True)
    metas = [r["meta"] for r in records if "meta" in r]
    assert metas and metas[0]["epoch_path"] == "xla_scan"
    # default reader still returns only epoch records
    plain = read_metric_stream(res.paths.metrics_jsonl)
    assert all("meta" not in r for r in plain)


def test_multisite_fused_unroll_tail_padding(monkeypatch):
    """Sub-chunk unrolling with r % unroll != 0 exercises the zero-mask
    tail-padding group and still matches the XLA epoch (S=300 -> r=3
    chunks, unroll=2 -> 2 groups with one padded sub-chunk)."""
    monkeypatch.setenv("EASYHYBRID_MS_UNROLL", "2")
    model, params, state, tensors = _make(S=300, N=9)
    logging = LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_multisite_epoch(
        model, state, ("adam", 0.01), logging, epochs_per_call=2,
        interpret=True,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    optimizer = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=False, epochs_per_call=2
    )
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(p_f["globals"]["Q10"]), np.asarray(p_x["globals"]["Q10"]),
        atol=5e-5, rtol=5e-4,
    )
    for a, b in zip(jax.tree.leaves(p_f["nn"]), jax.tree.leaves(p_x["nn"])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )
    assert int(o_f["t"][0]) == 2


@pytest.mark.parametrize("agg", ["sum", "mean"])
def test_multisite_fused_rmse_deferred_matches_xla(agg):
    """rmse (round 4 widening): the kernel accumulates RAW sse + unscaled
    diff cotangents across chunks and applies the agg/(2·n·r) factor at
    the last group — per-site updates included (whole-tile, deferred).
    Must match the XLA path exactly, multi-epoch counter intact."""
    model, params, state, tensors = _make(S=300, N=8)
    logging = LoggingLoss(training_loss="rmse", loss_types=("rmse",), agg=agg)
    assert supports_fused_multisite(model, ("adam", 0.01), logging, tensors)

    epochs = 3
    fused = make_fused_multisite_epoch(
        model, state, ("adam", 0.01), logging, shuffle=False,
        epochs_per_call=epochs, interpret=True,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    optimizer = optax.flatten(optax.adam(0.01))
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=False, epochs_per_call=epochs
    )
    p_x, _, _, loss_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(p_f)[0],
        jax.tree_util.tree_flatten_with_path(p_x)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=str(path),
        )
    assert int(o_f["t"][0]) == epochs


def _xla_multisite(model, logging, opt, epochs, params, state, tensors):
    from easyhybrid_tpu.training.optimizers import resolve_optimizer
    from easyhybrid_tpu.training.train import _flatten_safe

    optimizer = resolve_optimizer(opt)
    if _flatten_safe(opt):  # lamb's per-leaf trust ratio must not flatten
        optimizer = optax.flatten(optimizer)
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=False, epochs_per_call=epochs
    )
    return xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(0),
    )


def _assert_trees_close(p_f, p_x):
    fa, ta = jax.tree_util.tree_flatten_with_path(p_f)
    fb, tb = jax.tree_util.tree_flatten_with_path(p_x)
    assert ta == tb, f"param tree structures differ: {ta} vs {tb}"
    for (path, a), (_, b) in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
            err_msg=str(path),
        )


@pytest.mark.parametrize(
    "S,batchsize,opt,loss,agg",
    [
        (256, 128, ("adam", 0.01), "mse", "sum"),     # nb=2, r_b=1, exact
        (300, 128, ("adam", 0.01), "mse", "mean"),    # nb=3, padded tail batch
        (256, 128, ("sgd", 0.05), "nseLoss", "sum"),  # per-batch SST scales
        (512, 256, ("adamw", 0.01), "mse", "sum"),    # r_b=2: multi-chunk batch
        (256, 128, ("lion", 0.003), "mae", "mean"),   # two-slot optimizer
        # rmse joined the minibatch envelope late round 4: its deferred
        # factor is batch-scoped (per-batch SSE reset + factor application
        # at each batch's last group, where updates already defer)
        (256, 128, ("adam", 0.01), "rmse", "sum"),    # nb=2 deferred factor
        (300, 128, ("sgd", 0.05), "rmse", "mean"),    # padded tail batch
        (512, 256, ("adam", 0.01), "rmse", "sum"),    # r_b=2 multi-chunk
    ],
)
def test_multisite_fused_minibatch_matches_xla(S, batchsize, opt, loss, agg):
    """MINIBATCHED sites (round 4): several site batches per epoch run the
    kernel with per-batch deferred whole-tile updates — out-of-batch packed
    rows carry zero grads, i.e. exactly optax's zero-grad moment decay —
    and must match the XLA scan epoch (which sees the same static batch
    partition under shuffle=False, gathering params via _site_idx)."""
    model, params, state, tensors = _make(
        S=S, N=8, batchsize=batchsize, site_idx=True
    )
    logging = LoggingLoss(training_loss=loss, loss_types=(loss,), agg=agg)
    nb = int(tensors.weight.shape[0])
    assert nb > 1
    assert supports_fused_multisite(model, opt, logging, tensors)

    epochs = 3
    fused = make_fused_multisite_epoch(
        model, state, opt, logging, shuffle=False,
        epochs_per_call=epochs, interpret=True,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    p_x, _, _, loss_x = _xla_multisite(
        model, logging, opt, epochs, params, state, tensors
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    _assert_trees_close(p_f, p_x)
    # one optimizer step per site batch
    assert int(o_f["t"][0]) == epochs * nb


@pytest.mark.parametrize("loss", ["mse", "rmse"])
def test_multisite_fused_minibatch_empty_batch_guard(loss):
    """A fully-masked site batch must not step the optimizer, zero earlier
    batches' loss contributions, or decay moments — parity with the XLA
    epoch's empty-batch guard (epoch.jl:35-37 analog). rmse additionally
    checks that the batch-scoped deferred factor (1/(2·rmse) with
    rmse = 0 on the empty batch) cannot leak a non-finite update: the
    accumulated grads it scales are exactly zero there."""
    model, params, state, tensors = _make(
        S=256, N=8, nan_frac=0.0, batchsize=128, site_idx=True
    )
    # mask out EVERY target in the second site batch (sites 128..255)
    mask = {k: np.array(v) for k, v in tensors.mask.items()}
    for k in mask:
        mask[k][1] = 0.0
    from easyhybrid_tpu.data.loaders import EpochTensors

    tensors = EpochTensors(
        x=tensors.x, forcing=tensors.forcing, y=tensors.y,
        mask=jax.tree.map(jnp.asarray, mask), weight=tensors.weight,
        n_samples=tensors.n_samples,
    )
    logging = LoggingLoss(training_loss=loss, loss_types=(loss,))
    epochs = 2
    fused = make_fused_multisite_epoch(
        model, state, ("adam", 0.01), logging, shuffle=False,
        epochs_per_call=epochs, interpret=True,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    p_x, _, _, loss_x = _xla_multisite(
        model, logging, ("adam", 0.01), epochs, params, state, tensors
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    _assert_trees_close(p_f, p_x)
    # the empty batch advances neither path's step counter
    assert int(o_f["t"][0]) == epochs  # 1 valid batch × 2 epochs


@pytest.mark.parametrize("spec_fn", [lambda: eh.pinball(0.3),
                                     lambda: eh.huber(0.7)])
def test_multisite_fused_minibatch_elementwise(spec_fn):
    spec = spec_fn()
    model, params, state, tensors = _make(
        S=256, N=6, batchsize=128, site_idx=True
    )
    logging = LoggingLoss(training_loss=spec, loss_types=("mse",))
    assert supports_fused_multisite(model, ("adam", 0.01), logging, tensors)
    fused = make_fused_multisite_epoch(
        model, state, ("adam", 0.01), logging, shuffle=False,
        epochs_per_call=2, interpret=True,
    )
    p_f, _, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    p_x, _, _, loss_x = _xla_multisite(
        model, logging, ("adam", 0.01), 2, params, state, tensors
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    _assert_trees_close(p_f, p_x)


def test_multisite_fused_minibatch_unroll_divisor(monkeypatch):
    """EASYHYBRID_MS_UNROLL larger than / not dividing the per-batch chunk
    count shrinks to a divisor so no grid group straddles a batch
    boundary."""
    monkeypatch.setenv("EASYHYBRID_MS_UNROLL", "4")
    model, params, state, tensors = _make(
        S=512, N=6, batchsize=256, site_idx=True
    )  # r_b=2: unroll 4 -> 2
    logging = LoggingLoss(training_loss="mse", loss_types=("mse",))
    fused = make_fused_multisite_epoch(
        model, state, ("adam", 0.01), logging, shuffle=False,
        epochs_per_call=2, interpret=True,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    p_x, _, _, loss_x = _xla_multisite(
        model, logging, ("adam", 0.01), 2, params, state, tensors
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    _assert_trees_close(p_f, p_x)
    assert int(o_f["t"][0]) == 4  # 2 batches × 2 epochs


def test_multisite_minibatch_envelope():
    """Minibatched-site envelope: 128-multiple batch + shuffle=False +
    identity site order + batch-local loss; everything else → XLA."""
    model, params, state, tensors = _make(
        S=256, N=4, batchsize=128, site_idx=True
    )
    logging = LoggingLoss(training_loss="mse", loss_types=("mse",))
    assert supports_fused_multisite(
        model, ("adam", 0.01), logging, tensors, shuffle=False
    )
    # round 5: shuffled site minibatches join the envelope (per-epoch
    # slot-map permutation around one launch per epoch); unknown modes out
    assert supports_fused_multisite(
        model, ("adam", 0.01), logging, tensors, shuffle=True
    )
    assert supports_fused_multisite(
        model, ("adam", 0.01), logging, tensors, shuffle="batches"
    )
    assert not supports_fused_multisite(
        model, ("adam", 0.01), logging, tensors, shuffle="per_shard"
    )
    # rmse joined the minibatch envelope late round 4 (batch-scoped
    # deferred factor)
    rmse = LoggingLoss(training_loss="rmse", loss_types=("rmse",))
    assert supports_fused_multisite(
        model, ("adam", 0.01), rmse, tensors, shuffle=False
    )
    # non-identity site order (custom loader): rejected
    perm_tensors = jax.tree.map(jnp.copy, tensors)
    sidx = np.asarray(perm_tensors.forcing["_site_idx"])
    sidx_flat = sidx.reshape(-1, sidx.shape[-1])[::-1].reshape(sidx.shape)
    perm_tensors.forcing["_site_idx"] = jnp.asarray(sidx_flat.copy())
    assert not supports_fused_multisite(
        model, ("adam", 0.01), logging, perm_tensors, shuffle=False
    )
    # single-batch case is indifferent to the shuffle mode
    model1, _, _, tensors1 = _make(S=256, N=4)
    assert supports_fused_multisite(
        model1, ("adam", 0.01), logging, tensors1, shuffle=True
    )


@pytest.mark.parametrize(
    "opt,loss,batchsize",
    [
        (("lamb", 0.01), "mse", None),                       # one site batch
        (("lamb", {"learning_rate": 0.01, "weight_decay": 0.02}),
         "mae", None),                                        # + weight decay
        (("lamb", 0.01), "mse", 128),                         # minibatched
        (("lamb", 0.01), "rmse", None),                       # + deferred loss
    ],
)
def test_multisite_fused_lamb_matches_xla(opt, loss, batchsize):
    """lamb (round 4): per-site updates defer to the whole-tile path, where
    the packed (R_pad, 128) tile IS the stacked (S, 1) leaf — the update's
    tile-norm dots compute exactly optax's per-leaf trust ratio. Must match
    the UNFLATTENED optax.lamb trajectory (flatten would corrupt the
    per-leaf norms into one global norm)."""
    model, params, state, tensors = _make(
        S=256, N=8, batchsize=batchsize, site_idx=batchsize is not None
    )
    logging = LoggingLoss(training_loss=loss, loss_types=(loss,))
    assert supports_fused_multisite(model, opt, logging, tensors)

    epochs = 3
    fused = make_fused_multisite_epoch(
        model, state, opt, logging, shuffle=False,
        epochs_per_call=epochs, interpret=True,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, jax.random.PRNGKey(0),
    )
    p_x, _, _, loss_x = _xla_multisite(
        model, logging, opt, epochs, params, state, tensors
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    _assert_trees_close(p_f, p_x)
    nb = int(tensors.weight.shape[0])
    assert int(o_f["t"][0]) == epochs * nb


@pytest.mark.parametrize(
    "loss,batchsize",
    [
        ("mse", None),    # one site batch: immediate row updates carry u
        ("mae", 128),     # minibatched: whole-tile deferred updates with u
        ("rmse", None),   # deferred-factor path with u
    ],
)
def test_multisite_fused_amsgrad_matches_xla(loss, batchsize):
    """amsgrad (round 4): optax's nu_max rides a third carried buffer set
    (shared leaves + per-site packed tiles). Parity with optax.amsgrad
    through the XLA epoch on every update path — immediate per-row,
    deferred whole-tile (minibatch), and deferred-factor (rmse)."""
    model, params, state, tensors = _make(
        S=256, N=8, batchsize=batchsize, site_idx=batchsize is not None
    )
    opt = ("amsgrad", 0.01)
    logging = LoggingLoss(training_loss=loss, loss_types=(loss,))
    assert supports_fused_multisite(model, opt, logging, tensors)

    epochs = 3
    fused = make_fused_multisite_epoch(
        model, state, opt, logging, shuffle=False,
        epochs_per_call=epochs, interpret=True,
    )
    p_f, o_f, _, loss_f = fused(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params, opt),
        state, tensors, jax.random.PRNGKey(0),
    )
    assert "u" in o_f  # nu_max came back for warm restarts
    p_x, _, _, loss_x = _xla_multisite(
        model, logging, opt, epochs, params, state, tensors
    )
    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-4)
    _assert_trees_close(p_f, p_x)
    nb = int(tensors.weight.shape[0])
    assert int(o_f["t"][0]) == epochs * nb


def test_multisite_rmse_envelope_bounds():
    """rmse is single-target only in the multisite kernel (the deferred
    factor is per-target); batch-statistic losses stay out."""
    model, params, state, tensors = _make(S=130, N=4)
    ll1 = LoggingLoss(training_loss="rmse", loss_types=("rmse",))
    assert supports_fused_multisite(model, ("adam", 0.01), ll1, tensors)
    # two targets: rejected
    base2 = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"], forcing=["ta"],
        targets=["reco", "reco2"],
        mechanistic_model=lambda *, ta, rb, Q10: {
            "reco": rb * Q10 ** (0.1 * (ta - 15.0)),
            "reco2": rb + Q10,
        },
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"], global_param_names=["Q10"],
        hidden_layers=[8], activation="swish", scale_nn_outputs=True,
    )
    model2 = eh.MultiSiteHybridModel(base2, n_sites=130, share_nn=True)
    assert not supports_fused_multisite(model2, ("adam", 0.01), ll1)
    ll_stat = LoggingLoss(training_loss="pearsonLoss",
                          loss_types=("pearsonLoss",))
    assert not supports_fused_multisite(model, ("adam", 0.01), ll_stat)


# --------------------------------------------------------------------------
# round 5: shuffled site minibatches + arbitrary batchsizes
# --------------------------------------------------------------------------

@pytest.mark.parametrize(
    "S,batchsize,opt,loss,shuffle",
    [
        (200, 100, ("adam", 0.01), "mse", False),   # non-128-mult, static
        (256, 128, ("adam", 0.01), "mse", True),    # shuffled, aligned
        (200, 100, ("sgd", 0.05), "mse", True),     # shuffled + padded
        (256, 128, ("adam", 0.01), "mae", "batches"),  # batch-order shuffle
        (256, 128, ("adam", 0.01), "rmse", True),   # deferred factor
        (200, 100, ("lamb", 0.01), "mse", True),    # whole-tile trust ratio
        (256, 128, ("amsgrad", 0.01), "mse", True),  # third buffer set
    ],
)
def test_multisite_minibatch_shuffle_and_padding_match_xla(
    S, batchsize, opt, loss, shuffle
):
    """Round 5 lifts the round-4 minibatch restrictions: ANY batchsize
    (per-batch 128-alignment slot padding) and shuffle in (True, False,
    'batches') — the shuffled modes compose the XLA path's exact per-epoch
    site permutation (same epoch_permutation stream for the same key) into
    the slot map, one launch per epoch, packed tiles gathered/scattered
    around it. Trajectories must match the XLA epoch for the same key."""
    model, params, state, tensors = _make(
        S=S, N=6, batchsize=batchsize, site_idx=True
    )
    logging = LoggingLoss(training_loss=loss, loss_types=("mse",))
    assert supports_fused_multisite(
        model, opt, logging, tensors, shuffle=shuffle
    )
    epochs = 3
    fused = make_fused_multisite_epoch(
        model, state, opt, logging, shuffle=shuffle,
        epochs_per_call=epochs, interpret=True,
    )
    p_f, o_f, _, l_f = fused(
        jax.tree.map(jnp.copy, params),
        init_fused_opt_state(params, opt),
        state, tensors, jax.random.PRNGKey(7),
    )
    from easyhybrid_tpu.training.optimizers import resolve_optimizer
    from easyhybrid_tpu.training.train import _flatten_safe

    optimizer = resolve_optimizer(opt)
    if _flatten_safe(opt):
        optimizer = optax.flatten(optimizer)
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=shuffle, epochs_per_call=epochs
    )
    p_x, _, _, l_x = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, jax.random.PRNGKey(7),
    )
    _assert_trees_close(p_f, p_x)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=2e-4)
    nb = int(tensors.weight.shape[0])
    assert int(o_f["t"][0]) == epochs * nb


def test_multisite_shuffled_warm_start_continues_chain():
    """Two 2-epoch shuffled calls == one 4-epoch call when the keys line
    up (the scan's per-epoch permutations must consume the key stream the
    way the XLA loop does, and the canonical scatter-back must round-trip
    the packed tiles exactly)."""
    model, params, state, tensors = _make(
        S=200, N=6, batchsize=100, site_idx=True
    )
    logging = LoggingLoss(training_loss="mse", loss_types=("mse",))
    k1, k2 = jax.random.PRNGKey(11), jax.random.PRNGKey(12)
    fused2 = make_fused_multisite_epoch(
        model, state, ("adam", 0.01), logging, shuffle=True,
        epochs_per_call=2, interpret=True,
    )
    p1, o1, _, _ = fused2(
        jax.tree.map(jnp.copy, params), init_fused_opt_state(params),
        state, tensors, k1,
    )
    p2, o2, _, _ = fused2(p1, o1, state, tensors, k2)
    from easyhybrid_tpu.training.optimizers import resolve_optimizer

    optimizer = optax.flatten(resolve_optimizer(("adam", 0.01)))
    xla = make_train_epoch(
        model, logging, optimizer, shuffle=True, epochs_per_call=2
    )
    px1, ox1, _, _ = xla(
        jax.tree.map(jnp.copy, params), optimizer.init(params),
        jax.tree.map(jnp.copy, state), tensors, k1,
    )
    px2, _, _, _ = xla(px1, ox1, jax.tree.map(jnp.copy, state), tensors, k2)
    _assert_trees_close(p2, px2)
    assert int(o2["t"][0]) == 8  # 2 batches × 4 epochs
