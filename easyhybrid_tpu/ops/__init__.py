"""Pallas TPU kernels for the hot ops.

* :mod:`.fused_forward` — fused hybrid inference kernel (real-chip validated)
* :mod:`.fused_epoch` — whole-training-epoch kernel (interpret-validated;
  real-chip lowering pending a Mosaic autodiff fix — see its docstring)
"""

from .fused_epoch import init_fused_opt_state, make_fused_epoch, supports_fused_epoch
from .fused_forward import make_fused_forward, supports_fused_forward

__all__ = [
    "make_fused_epoch",
    "supports_fused_epoch",
    "init_fused_opt_state",
    "make_fused_forward",
    "supports_fused_forward",
]
