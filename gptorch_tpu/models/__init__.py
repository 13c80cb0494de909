"""GP models (reference: gptorch/models/__init__.py:20-21 exports GPR, VFE,
SVGP; FITC was a stub there and is real here; GPLVM was dead code there and
is reimplemented in :mod:`gptorch_tpu.models.gplvm`)."""

from .base import GPModel
from .derivative import DerivativeGPR
from .ensemble import GPEnsemble
from .gpr import GPR
from .gplvm import GPLVM
from .kronecker import GridGPR
from .laplace import LaplaceGP
from .heteroscedastic import HeteroscedasticSVGP
from .multioutput import ICM, LMC
from .warped import WarpedGPR
from .deep import DeepGP
from .posterior import Posterior
from .ski import SKIGPR
from .sparse_gpr import FITC, SVGP, VFE
from .statespace import StateSpaceGPR
from .streaming import StreamingVFE
from .studentt import TPR
from .online import OnlineSGPR
from .vecchia import VecchiaGPR

__all__ = [
    "GPModel", "GPR", "VFE", "SVGP", "FITC", "GPLVM", "GridGPR", "ICM",
    "LMC", "LaplaceGP", "HeteroscedasticSVGP", "WarpedGPR", "DeepGP", "Posterior",
    "SKIGPR", "StateSpaceGPR", "GPEnsemble", "StreamingVFE", "VecchiaGPR", "OnlineSGPR", "TPR",
    "DerivativeGPR",
]
