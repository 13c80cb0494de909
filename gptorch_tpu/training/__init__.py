from . import fit
from . import checkpoint
from . import natgrad

from .fit import fit_optax, fit_scipy, fit_scan, make_optimizer
from .natgrad import fit_svgp_natgrad, make_natgrad_step

__all__ = [
    "fit",
    "checkpoint",
    "natgrad",
    "fit_optax",
    "fit_scipy",
    "fit_scan",
    "make_optimizer",
    "fit_svgp_natgrad",
    "make_natgrad_step",
]
