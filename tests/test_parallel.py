"""Parallel layer: mesh sharding, multi-site vmap, multisite data prep,
observability utilities. Runs on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

import easyhybrid_tpu as eh
from easyhybrid_tpu.parallel import (
    MultiSiteHybridModel,
    data_parallel_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from easyhybrid_tpu.parallel.multisite import prepare_multisite_data


def test_make_mesh():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_mesh(2)
    assert mesh2.devices.size == 2
    with pytest.raises(ValueError):
        make_mesh(10_000)


def test_shard_and_replicate():
    mesh = make_mesh(4)
    x = jnp.arange(32.0).reshape(8, 4)
    xs = shard_batch(x, mesh)
    from jax.sharding import PartitionSpec as P

    from easyhybrid_tpu.utils.profiling import assert_sharding

    assert_sharding(xs, mesh, P("data"))
    params = {"w": jnp.ones((3, 3))}
    pr = replicate(params, mesh)
    assert_sharding(pr["w"], mesh, P())
    # scalars pass through unsharded
    tree = {"a": jnp.ones((8,)), "n": jnp.asarray(3)}
    st = shard_batch(tree, mesh)
    assert st["n"].shape == ()


def test_multi_device_training(rbq10_model):
    df = eh.gen_rbq10_data(256, seed=1)
    res = eh.train(
        rbq10_model,
        df,
        nepochs=2,
        batchsize=64,
        multi_device=True,
        show_progress=False,
    )
    assert np.isfinite(res.best_loss)


def test_multisite_model_shared_nn(rbq10_model):
    S, N = 6, 20
    ms = MultiSiteHybridModel(rbq10_model, n_sites=S, share_nn=True)
    params, state = ms.init(jax.random.PRNGKey(0))
    # per-site globals, shared NN
    assert params["globals"]["Q10"].shape == (S, 1)
    assert params["nn"]["layers"][0]["w"].ndim == 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, N, 2)), jnp.float32)
    ta = jnp.asarray(rng.normal(10, 5, (S, N)), jnp.float32)
    out, _ = ms.apply(params, state, (x, {"ta": ta}))
    assert out["reco"].shape == (S, N)
    # per-site Q10s differ after perturbing one site's raw value
    p2 = jax.tree.map(lambda a: a, params)
    p2["globals"]["Q10"] = p2["globals"]["Q10"].at[0].add(3.0)
    out2, _ = ms.apply(p2, state, (x, {"ta": ta}))
    assert not np.allclose(out2["reco"][0], out["reco"][0])
    np.testing.assert_allclose(out2["reco"][1], out["reco"][1], rtol=1e-6)


def test_multisite_model_per_site_nn(rbq10_model):
    S, N = 4, 10
    ms = MultiSiteHybridModel(rbq10_model, n_sites=S, share_nn=False)
    params, state = ms.init(jax.random.PRNGKey(0))
    assert params["nn"]["layers"][0]["w"].shape[0] == S  # stacked per site
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, N, 2)), jnp.float32)
    ta = jnp.asarray(rng.normal(10, 5, (S, N)), jnp.float32)
    out, _ = ms.apply(params, state, (x, {"ta": ta}))
    assert out["reco"].shape == (S, N)


def test_prepare_multisite_data(rbq10_model):
    df = eh.gen_rbq10_data(95, seed=2)  # ragged: 10 sites of <=10
    df["site"] = np.repeat(np.arange(10), 10)[:95]
    data = prepare_multisite_data(rbq10_model, df, "site")
    assert data.x.shape == (10, 10, 2)
    assert data.forcing["ta"].shape == (10, 10)
    # ragged tail padded with NaN targets
    assert np.isnan(data.y["reco"][-1, -1])


def test_multisite_grad_flow(rbq10_model):
    """Gradient reaches per-site globals independently."""
    S, N = 3, 16
    ms = MultiSiteHybridModel(rbq10_model, n_sites=S)
    params, state = ms.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(S, N, 2)), jnp.float32)
    ta = jnp.asarray(rng.normal(10, 5, (S, N)), jnp.float32)
    y = jnp.asarray(rng.normal(3, 1, (S, N)), jnp.float32)

    def loss(p):
        out, _ = ms.apply(p, state, (x, {"ta": ta}))
        return jnp.mean((out["reco"] - y) ** 2)

    g = jax.grad(loss)(params)
    gq = np.asarray(g["globals"]["Q10"])
    assert gq.shape == (S, 1)
    assert np.all(np.isfinite(gq)) and np.all(gq != 0)


def test_step_timer_and_debug_nans():
    from easyhybrid_tpu.utils.profiling import StepTimer, debug_nans

    t = StepTimer()
    with t:
        pass
    with t:
        pass
    s = t.summary()
    assert s["count"] == 2
    assert "mean" in repr(t)

    with debug_nans(False):
        assert not jax.config.jax_debug_nans
    with debug_nans(True):
        assert jax.config.jax_debug_nans


def test_banner(capsys):
    from easyhybrid_tpu.utils.banner import print_banner

    print_banner(force=True)
    out = capsys.readouterr().out
    assert "0.1.0" in out

    import os

    os.environ["EASYHYBRID_PRINT_BANNER"] = "0"
    try:
        print_banner(force=True)
        assert capsys.readouterr().out == ""
    finally:
        del os.environ["EASYHYBRID_PRINT_BANNER"]


def test_multisite_end_to_end_train(rbq10_model):
    """Full train() over a MultiSiteHybridModel: per-site Q10s recovered."""
    df = eh.gen_rbq10_data(400, seed=4)
    df["site"] = np.repeat(np.arange(8), 50)
    ms = MultiSiteHybridModel(rbq10_model, n_sites=8, share_nn=True)
    data = prepare_multisite_data(rbq10_model, df, "site")
    res = eh.train(
        ms, data, nepochs=2, batchsize=4, show_progress=False,
        split_data_at=0.75,
    )
    assert np.isfinite(res.best_loss)
    assert res.params["globals"]["Q10"].shape == (8, 1)
    # long-format frames: site-major targets flatten with sample/step cols
    assert {"sample", "step"} <= set(res.train_obs.columns)


def _sharded_epoch_setup(rbq10_model, shuffle, n_dev=8):
    """Build a compiled sharded epoch program; returns (hlo_text, run)."""
    import optax

    from easyhybrid_tpu.data.loaders import build_epoch_tensors
    from easyhybrid_tpu.data.prepare import prepare_data
    from easyhybrid_tpu.losses.specs import LoggingLoss
    from easyhybrid_tpu.parallel.mesh import shard_epoch_tensors
    from easyhybrid_tpu.training.epoch import make_train_epoch

    mesh = make_mesh(n_dev)
    df = eh.gen_rbq10_data(512, seed=3)
    data = prepare_data(rbq10_model, df)
    tensors = shard_epoch_tensors(build_epoch_tensors(data, 128), mesh)
    params, state = rbq10_model.init(jax.random.PRNGKey(0))
    params = replicate(params, mesh)
    state = replicate(state, mesh)
    opt = optax.adam(0.01)
    opt_state = replicate(opt.init(params), mesh)
    logging = LoggingLoss(loss_types=("mse",), training_loss="mse", agg="sum")
    epoch_fn = make_train_epoch(
        rbq10_model, logging, opt, shuffle=shuffle, jit=False, mesh=mesh
    )
    key = jax.random.PRNGKey(1)
    lowered = jax.jit(epoch_fn).lower(params, opt_state, state, tensors, key)
    hlo = lowered.compile().as_text()
    return hlo, lambda: jax.jit(epoch_fn)(params, opt_state, state, tensors, key)


def test_per_shard_shuffle_collective_free(rbq10_model):
    """shuffle='per_shard' compiles with NO data-movement collectives (no
    all-to-all/all-gather/collective-permute); the gradient all-reduce is
    the only cross-chip op. A global shuffle over the sharded sample axis
    does insert data collectives — the hazard this mode removes."""
    hlo, run = _sharded_epoch_setup(rbq10_model, "per_shard")
    for bad in ("all-to-all", "collective-permute", "all-gather"):
        assert bad not in hlo, f"per_shard epoch contains {bad}"
    assert "all-reduce" in hlo  # grad psum still rides ICI
    p, o, s, loss = run()
    assert np.isfinite(float(loss))

    hlo_global, _ = _sharded_epoch_setup(rbq10_model, True)
    assert any(
        bad in hlo_global
        for bad in ("all-to-all", "collective-permute", "all-gather")
    ), "expected the global shuffle to need data collectives"


def test_per_shard_shuffle_is_permutation(rbq10_model):
    """The shard-local shuffle permutes samples (keeps the multiset of
    sample rows and their target pairing intact)."""
    from easyhybrid_tpu.data.loaders import build_epoch_tensors
    from easyhybrid_tpu.data.prepare import prepare_data
    from easyhybrid_tpu.parallel.mesh import shard_epoch_tensors
    from easyhybrid_tpu.training.epoch import _per_shard_shuffle

    mesh = make_mesh(4)
    df = eh.gen_rbq10_data(256, seed=7)
    data = prepare_data(rbq10_model, df)
    tensors = shard_epoch_tensors(build_epoch_tensors(data, 64), mesh)
    out = jax.jit(
        lambda t, k: _per_shard_shuffle(t, k, mesh)
    )(tensors, jax.random.PRNGKey(5))
    ta0 = np.sort(np.asarray(tensors.forcing["ta"]).ravel())
    ta1 = np.sort(np.asarray(out.forcing["ta"]).ravel())
    np.testing.assert_array_equal(ta0, ta1)
    assert not np.array_equal(
        np.asarray(tensors.forcing["ta"]), np.asarray(out.forcing["ta"])
    )
    # row integrity: (ta, reco) pairs survive the permutation together
    pairs0 = np.sort(
        np.stack([np.asarray(tensors.forcing["ta"]).ravel(),
                  np.asarray(tensors.y["reco"]).ravel()], -1), axis=0
    )
    pairs1 = np.sort(
        np.stack([np.asarray(out.forcing["ta"]).ravel(),
                  np.asarray(out.y["reco"]).ravel()], -1), axis=0
    )
    np.testing.assert_array_equal(pairs0, pairs1)


def test_multi_device_default_shuffle_is_per_shard(rbq10_model, caplog):
    import logging as _logging

    df = eh.gen_rbq10_data(256, seed=1)
    with caplog.at_level(_logging.INFO, logger="easyhybrid_tpu"):
        res = eh.train(
            rbq10_model, df, nepochs=1, batchsize=64, multi_device=True,
            show_progress=False,
        )
    assert np.isfinite(res.best_loss)
    assert any("per_shard" in r.message for r in caplog.records)


def test_multi_device_matches_single_device_numerics(rbq10_model):
    """multi_device training (8-CPU mesh, psum-reduced grads) matches the
    single-device trajectory at eval_every>1 (shuffle off: the per_shard
    shuffle legitimately reorders differently)."""
    df = eh.gen_rbq10_data(256, seed=9)
    kw = dict(
        nepochs=4, eval_every=2, batchsize=64, shuffle_each_epoch=False,
        show_progress=False, random_seed=5,
    )
    r1 = eh.train(rbq10_model, df, **kw)
    r8 = eh.train(rbq10_model, df, multi_device=True, **kw)
    assert len(r1.val_history) == len(r8.val_history) == 3
    for a, b in zip(r1.val_history, r8.val_history):
        np.testing.assert_allclose(
            a["mse"]["sum"], b["mse"]["sum"], rtol=2e-4
        )
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r8.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3
        )


def test_multi_device_full_train_deferred(rbq10_model):
    """The dryrun's e2e path: full train() over the mesh runs the deferred
    loop with on-device early stopping and finishes finite."""
    df = eh.gen_rbq10_data(192, seed=3)
    res = eh.train(
        rbq10_model, df, nepochs=4, eval_every=2, batchsize=64,
        multi_device=True, patience=2, tracked_params=["Q10"],
        show_progress=False,
    )
    assert np.isfinite(res.best_loss)
    assert res.loop_mode == "deferred"
    assert "Q10" in (res.tracked or {})
