from . import fit
from . import checkpoint

from .fit import fit_optax, fit_scipy, fit_scan, make_optimizer

__all__ = [
    "fit",
    "checkpoint",
    "fit_optax",
    "fit_scipy",
    "fit_scan",
    "make_optimizer",
]
