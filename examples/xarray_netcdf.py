"""Labeled-array (xarray) NetCDF ingestion — RbQ10 end-to-end.

Parity with the reference's labeled-array path: the quick start loads the
``Synthetic4BookChap.nc`` timeseries into a labeled array and dispatches
``prepare_data`` on it (reference: README.md:134-209, prepare_data.jl:3-29,
tools.jl:53-78). Here the synthetic RbQ10 series is written to a NetCDF
file, loaded back via :func:`easyhybrid_tpu.load_timeseries_xarray`
(an ``xr.Dataset`` when xarray is installed, the built-in reader's
DataFrame otherwise), trained on directly, and — when xarray is present —
the results are exported back out as an ``xr.Dataset``.

Run: python examples/xarray_netcdf.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import easyhybrid_tpu as eh


def rbq10(*, ta, rb, Q10, tref=15.0):
    return {"reco": rb * Q10 ** (0.1 * (ta - tref))}


def write_netcdf(df, path):
    """Write the synthetic series as a classic NetCDF-3 file (the format
    the built-in reader and xarray's scipy backend both understand)."""
    from scipy.io import netcdf_file

    with netcdf_file(path, "w") as f:
        f.createDimension("time", len(df))
        for col in ("sw_pot", "dsw_pot", "ta", "reco"):
            v = f.createVariable(col, "f4", ("time",))
            v[:] = np.asarray(df[col], np.float32)


def main():
    path = os.path.join(tempfile.gettempdir(), "rbq10_synth.nc")
    write_netcdf(eh.gen_rbq10_data(20_000, seed=42), path)

    data = eh.load_timeseries_xarray(path)
    print(f"loaded {type(data).__name__} from {path}")

    model = eh.construct_hybrid_model(
        predictors=["sw_pot", "dsw_pot"],
        forcing=["ta"],
        targets=["reco"],
        mechanistic_model=rbq10,
        parameters={"rb": (3.0, 0.0, 13.0), "Q10": (2.0, 1.0, 4.0)},
        neural_param_names=["rb"],
        global_param_names=["Q10"],
        hidden_layers=[16, 16],
        activation="swish",
        scale_nn_outputs=True,
        input_batchnorm=True,
    )

    # xr.Dataset / DataFrame both dispatch straight into train
    results = eh.train(
        model,
        data,
        nepochs=int(os.environ.get("EASYHYBRID_EXAMPLE_EPOCHS", "100")),
        batchsize=512,
        optimizer=("rmsprop", 0.001),
        patience=30,
        show_progress=False,
    )

    q10 = float(
        np.asarray(eh.scale_param(results.params["globals"]["Q10"], 1.0, 4.0)).ravel()[0]
    )
    print(f"learned Q10 = {q10:.4f} (true 2.0) | best val MSE = {results.best_loss:.5f}")
    assert abs(q10 - 2.0) < 0.2

    try:
        ds = eh.to_dataset(results, which="val")
        print("exported results as xr.Dataset:", list(ds.data_vars))
    except ImportError:
        print("xarray not installed; results stay as DataFrames "
              "(results.val_obs / results.val_pred)")


if __name__ == "__main__":
    main()
