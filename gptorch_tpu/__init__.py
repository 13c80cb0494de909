"""gptorch_tpu: a TPU-native (JAX/XLA/Pallas/pjit) Gaussian-process framework.

A from-scratch re-design of the capabilities of cics-nd/gptorch v0.3.2
(exact GP regression, Titsias VFE sparse GPs, Hensman SVGP, kernel zoo,
constrained parameters, torch/scipy-style optimization) as idiomatic JAX:

* models are immutable pytrees; losses are pure functions; gradients via
  ``jax.grad`` instead of ``.backward()``;
* the hot O(n²d)/O(n³) paths (Gram assembly, Cholesky, triangular solves)
  run on the MXU, with fused Pallas kernels in :mod:`gptorch_tpu.ops` and
  multi-chip sharded variants in :mod:`gptorch_tpu.parallel`;
* numerical robustness (the reference's Cholesky jitter-escalation retry)
  is re-expressed jit-compatibly with ``lax.while_loop`` + NaN probes.

Layout mirrors the reference package (gptorch/__init__.py:6-16) so users can
port imports 1:1.
"""

__version__ = "0.5.0"

from . import bijectors
from . import functions
from . import kernels
from . import likelihoods
from . import mean_functions
from . import module
from . import nn
from . import param
from . import priors
from . import settings
from . import util

from .module import Module, get_trainable, with_trainable
from .param import Param, positive_param

from . import ekernels  # noqa: E402  (after kernels)
from . import models  # noqa: E402
from . import sampling  # noqa: E402
from . import bayesopt  # noqa: E402  (after models)
from . import mcmc  # noqa: E402  (after models)
from . import structure  # noqa: E402  (after models, training)

__all__ = [
    "bayesopt",
    "structure",
    "bijectors",
    "ekernels",
    "functions",
    "kernels",
    "likelihoods",
    "mcmc",
    "mean_functions",
    "models",
    "module",
    "nn",
    "param",
    "priors",
    "sampling",
    "settings",
    "util",
    "Module",
    "Param",
    "positive_param",
    "get_trainable",
    "with_trainable",
]
