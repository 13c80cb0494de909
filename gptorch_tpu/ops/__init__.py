"""TPU-optimized compute primitives.

* :mod:`blocked`     -- blocked Cholesky / triangular inverse / symmetric
                        products that keep the MXU busy with large GEMMs
                        (XLA's stock cholesky runs ~7x below matmul rate on
                        v5e; these close most of that gap).
* :mod:`gpr_fast`    -- fused exact-GPR NLML with a closed-form custom VJP:
                        O(n³) work = 1 blocked chol + 1 blocked trtri +
                        1 syrk, with O(n²)-streaming gradient contractions.
                        This is the headline-bench hot path.
* :mod:`pallas_gram` -- fused Pallas kernels for Gram assembly (squared
                        distance + kernel elementwise in one VMEM pass).
"""

from . import blocked
from . import gpr_fast
from . import pallas_gram

from .blocked import blocked_cholesky, blocked_trtri, cholesky_blocked, tril_square
from .gpr_fast import radial_nlml, rbf_nlml
from .pallas_gram import rbf_gram

__all__ = [
    "blocked",
    "gpr_fast",
    "pallas_gram",
    "blocked_cholesky",
    "cholesky_blocked",
    "blocked_trtri",
    "tril_square",
    "radial_nlml",
    "rbf_nlml",
    "rbf_gram",
]
