"""easyhybrid_tpu — a TPU-native JAX framework for hybrid modeling.

A from-scratch rebuild of the capabilities of ``EarthyScience/EasyHybrid.jl``
(hybrid models: neural networks composed with mechanistic process models,
with per-sample / global / fixed physical parameters) designed TPU-first:

* the hybrid forward (NN + bound scaling + physics) traces to ONE fused XLA
  program; * training epochs are single jitted ``lax.scan`` programs over
  device-resident padded batch tensors; * NaN handling is ``where``-masked
  reductions (static shapes, MXU-friendly); * scaling is ``jax.sharding``
  data parallelism over a TPU mesh plus ``vmap`` across sites.

Reference layer map: see SURVEY.md. Reference citations live in each
module's docstring.
"""

from .version import __version__

# core
from .params import (
    ParameterContainer,
    build_parameters,
    scale_param,
    unscale_param,
    hard_sigmoid,
    inv_hard_sigmoid,
    inv_sigmoid,
)

# models
from .models.nn import MLP, LSTMNet, Dense, construct_nn, ACTIVATIONS
from .models.hybrid import (
    SingleNNHybridModel,
    MultiNNHybridModel,
    construct_hybrid_model,
)
from .models.legacy import (
    LinearHM,
    RespirationRbQ10,
    RsComponents,
    RbQ10TwoParams,
    FluxPartModelQ10,
    m_rb_q10,
)
from .models.factory import make_hybrid, CustomHybridModel
from .models.show import format_model, format_parameter_table, install_reprs

install_reprs()

# losses
from .losses.metrics import (
    loss_fn,
    is_better,
    best_direction,
    check_training_loss,
    register_metric,
    masked_mean,
    pinball,
    huber,
)
from .losses.specs import (
    LoggingLoss,
    PerTarget,
    SymbolicLoss,
    FunctionLoss,
    ParameterizedLoss,
    ElementwiseLoss,
    ExtraLoss,
)
from .losses.compute import compute_loss

# data
from .data.prepare import HybridData, prepare_data
from .data.split import split_data, prepare_splits, train_val_indices
from .data.sequences import split_into_sequences, filter_sequences
from .data.synthetic import gen_linear_data, gen_linear_data_2outputs, gen_rbq10_data
from .data.loaders import build_epoch_tensors, batch_iterator
from .data.netcdf import load_timeseries_netcdf
from .data.xarray_io import (
    is_xarray_like,
    load_timeseries_xarray,
    to_dataset,
    xarray_to_dataframe,
)

# config
from .config.train_config import TrainConfig, DataConfig, TrainResults, validate_config
from .config.yaml_io import (
    get_full_config,
    save_hybrid_config,
    load_hybrid_config,
)

# training
from .training.train import train
from .training.history import TrainingHistory, EpochSnapshot
from .training.early_stopping import EarlyStopping
from .training.optimizers import resolve_optimizer
from .training.inference import ensemble_predict, make_inference_fn, predict
from .training.tune import (
    ModelSpec,
    tune,
    best_hyperparams,
    random_search,
    grid_search,
    cross_validate,
)
from .training.population import (
    PopulationResults,
    population_cross_validate,
    population_train,
)

# parallel
from .parallel.mesh import make_mesh, shard_batch, replicate
from .parallel.multisite import MultiSiteHybridModel

# io
from .io.checkpoint import (
    save_pytree,
    load_pytree,
    load_checkpoint,
    load_group,
    get_all_groups,
)
from .io.paths import TrainingPaths, resolve_paths

# utils
from .plotting.theme import hybrid_colors, set_theme, theme_easy_hybrid, use_theme
from .plotting.plots import plot_population
from .utils.weights import extract_weights, weight_l2, l2_extra_loss
from .utils.folds import make_folds
from .utils.wrapped_tuples import WrappedTuples
from .utils.profiling import trace, StepTimer, debug_nans, assert_sharding
from .utils.banner import print_banner
from .parallel.multisite import prepare_multisite_data

__all__ = [
    "__version__",
    # params
    "ParameterContainer",
    "build_parameters",
    "scale_param",
    "unscale_param",
    "hard_sigmoid",
    "inv_hard_sigmoid",
    "inv_sigmoid",
    # models
    "MLP",
    "LSTMNet",
    "Dense",
    "construct_nn",
    "ACTIVATIONS",
    "SingleNNHybridModel",
    "MultiNNHybridModel",
    "construct_hybrid_model",
    "LinearHM",
    "RespirationRbQ10",
    "RsComponents",
    "RbQ10TwoParams",
    "FluxPartModelQ10",
    "m_rb_q10",
    "make_hybrid",
    "CustomHybridModel",
    "format_model",
    "format_parameter_table",
    # losses
    "loss_fn",
    "is_better",
    "best_direction",
    "check_training_loss",
    "register_metric",
    "masked_mean",
    "pinball",
    "huber",
    "LoggingLoss",
    "PerTarget",
    "SymbolicLoss",
    "FunctionLoss",
    "ParameterizedLoss",
    "ElementwiseLoss",
    "ExtraLoss",
    "compute_loss",
    # data
    "HybridData",
    "prepare_data",
    "split_data",
    "prepare_splits",
    "train_val_indices",
    "split_into_sequences",
    "filter_sequences",
    "gen_linear_data",
    "gen_linear_data_2outputs",
    "gen_rbq10_data",
    "build_epoch_tensors",
    "batch_iterator",
    "load_timeseries_netcdf",
    "is_xarray_like",
    "load_timeseries_xarray",
    "to_dataset",
    "xarray_to_dataframe",
    # config
    "TrainConfig",
    "DataConfig",
    "TrainResults",
    "validate_config",
    "get_full_config",
    "save_hybrid_config",
    "load_hybrid_config",
    # training
    "train",
    "TrainingHistory",
    "EpochSnapshot",
    "EarlyStopping",
    "resolve_optimizer",
    "ModelSpec",
    "tune",
    "best_hyperparams",
    "random_search",
    "grid_search",
    "cross_validate",
    "population_train",
    "population_cross_validate",
    "PopulationResults",
    "make_inference_fn",
    "predict",
    "ensemble_predict",
    # parallel
    "make_mesh",
    "shard_batch",
    "replicate",
    "MultiSiteHybridModel",
    # io
    "save_pytree",
    "load_pytree",
    "load_checkpoint",
    "load_group",
    "get_all_groups",
    "TrainingPaths",
    "resolve_paths",
    # utils
    "extract_weights",
    "weight_l2",
    "hybrid_colors",
    "set_theme",
    "theme_easy_hybrid",
    "use_theme",
    "plot_population",
    "l2_extra_loss",
    "make_folds",
    "WrappedTuples",
    "trace",
    "StepTimer",
    "debug_nans",
    "assert_sharding",
    "print_banner",
    "prepare_multisite_data",
]
