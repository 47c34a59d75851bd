"""Checkpoint / config persistence (reference parity: src/io tests via
checkpoint reload usage in projects/RbQ10/Q10.jl:108-124)."""

import os

import numpy as np
import pytest

import easyhybrid_tpu as eh


def test_pytree_roundtrip(tmp_path):
    tree = {"a": np.arange(4.0), "b": {"c": np.ones((2, 3))}}
    path = str(tmp_path / "tree.pkl")
    eh.save_pytree(path, tree)
    loaded = eh.load_pytree(path)
    np.testing.assert_array_equal(loaded["a"], tree["a"])
    np.testing.assert_array_equal(loaded["b"]["c"], tree["b"]["c"])


def test_training_checkpoints(tmp_path, rbq10_model, rbq10_df):
    # show_progress forces the EAGER loop: per-epoch checkpoint cadence is
    # an eager-loop feature (the deferred loop writes initial+best post-hoc
    # — covered by test_train.py::test_deferred_save_training_posthoc)
    res = eh.train(
        rbq10_model,
        rbq10_df,
        nepochs=2,
        batchsize=64,
        save_training=True,
        output_folder=str(tmp_path),
        model_name="ckpt_test",
        tracked_params=["Q10"],
        show_progress=True,
    )
    assert res.loop_mode == "eager"
    run_dir = os.path.join(str(tmp_path), "ckpt_test")
    assert os.path.isdir(os.path.join(run_dir, "checkpoints"))
    # epoch 0, 1, 2
    assert len(os.listdir(os.path.join(run_dir, "checkpoints"))) == 3
    # best model + config snapshot + history
    assert os.path.exists(os.path.join(run_dir, "best_ckpt_test.pkl"))
    assert os.path.exists(os.path.join(run_dir, "config_ckpt_test.yaml"))
    assert os.path.exists(os.path.join(run_dir, "history_ckpt_test.json"))

    # groups / readers
    groups = eh.get_all_groups(run_dir)
    assert "params" in groups and "physical_params" in groups
    all_params = eh.load_group(run_dir, "params")
    assert len(all_params) == 3
    tracked = eh.load_group(run_dir, "physical_params")
    assert "Q10" in tracked[1]
    assert 1.0 < tracked[1]["Q10"] < 4.0

    # load best checkpoint and warm start from the file
    ckpt = eh.load_checkpoint(run_dir)
    assert "params" in ckpt
    res2 = eh.train(
        rbq10_model,
        rbq10_df,
        nepochs=1,
        train_from=os.path.join(run_dir, "best_ckpt_test.pkl"),
        show_progress=False,
    )
    assert np.isfinite(res2.best_loss)


def test_config_yaml_roundtrip(tmp_path, rbq10_model):
    path = str(tmp_path / "cfg.yaml")
    eh.save_hybrid_config(path, rbq10_model, eh.TrainConfig(), eh.DataConfig())
    cfg = eh.load_hybrid_config(path)
    assert cfg["model"]["targets"] == ["reco"]
    assert cfg["parameters"]["Q10"]["upper"] == 4.0
    # mechanistic-model source captured (reference config_yaml.jl:58-115)
    assert "rbq10" in (cfg["mechanistic_model"]["source"] or "")
    assert cfg["train_config"]["nepochs"] == 200


def test_full_config(rbq10_model):
    cfg = eh.get_full_config(rbq10_model)
    assert cfg["model"]["type"] == "SingleNNHybridModel"
    assert cfg["model"]["neural_param_names"] == ["rb"]


def test_epoch_files_numeric_sort(tmp_path):
    """Epoch checkpoints sort numerically past 9999 and stray files are
    ignored (advisor finding: lexicographic sorted(listdir) picked
    epoch_9999 over epoch_10000 and could return non-checkpoint files)."""
    run_dir = tmp_path / "run"
    ckpt_dir = run_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    for epoch in (0, 9999, 10000):
        eh.save_pytree(
            str(ckpt_dir / f"epoch_{epoch:04d}.pkl"),
            {"params": {"e": np.array([float(epoch)])}},
        )
    (ckpt_dir / "notes.txt").write_text("stray file, not a checkpoint")
    ckpt = eh.load_checkpoint(str(run_dir))
    assert float(ckpt["params"]["e"][0]) == 10000.0
    seq = eh.load_group(str(run_dir), "params")
    assert [float(p["e"][0]) for p in seq] == [0.0, 9999.0, 10000.0]


def test_orbax_checkpoint_format(tmp_path, rbq10_model, rbq10_df):
    """checkpoint_format='orbax' writes tensorstore-backed directories that
    read back through the same load_checkpoint/load_group API and can warm
    start a new run (TPU-native alternative to pickle)."""
    pytest.importorskip("orbax.checkpoint")
    res = eh.train(
        rbq10_model,
        rbq10_df,
        nepochs=2,
        batchsize=64,
        save_training=True,
        checkpoint_format="orbax",
        output_folder=str(tmp_path),
        model_name="orbax_test",
        tracked_params=["Q10"],
        show_progress=True,  # eager loop: per-epoch checkpoint cadence
    )
    run_dir = os.path.join(str(tmp_path), "orbax_test")
    ckpts = sorted(os.listdir(os.path.join(run_dir, "checkpoints")))
    assert ckpts == ["epoch_0000.orbax", "epoch_0001.orbax", "epoch_0002.orbax"]
    assert os.path.isdir(os.path.join(run_dir, "best_orbax_test.orbax"))

    all_params = eh.load_group(run_dir, "params")
    assert len(all_params) == 3
    tracked = eh.load_group(run_dir, "physical_params")
    assert 1.0 < tracked[1]["Q10"] < 4.0

    ckpt = eh.load_checkpoint(run_dir)  # dir fallback → best model
    assert "params" in ckpt and "state" in ckpt
    np.testing.assert_allclose(
        np.asarray(ckpt["params"]["globals"]["Q10"]),
        np.asarray(res.params["globals"]["Q10"]),
        rtol=1e-6,
    )
    res2 = eh.train(
        rbq10_model,
        rbq10_df,
        nepochs=1,
        train_from=os.path.join(run_dir, "best_orbax_test.orbax"),
        show_progress=False,
    )
    assert np.isfinite(res2.best_loss)
