"""Multi-chip scale-out over a ``jax.sharding.Mesh``.

The reference has NO distributed capability of any kind (verified in
SURVEY.md §2.3: no torch.distributed/NCCL/MPI anywhere; single-GPU
``model.cuda()`` only, reference models/base.py:392-416).  This package is
the genuinely new, TPU-native capability layer:

* :mod:`mesh`     -- mesh construction helpers.
* :mod:`gram`     -- ring-scheduled Gram assembly: X row-shards rotate around
                     the ICI ring (``ppermute``), each device computing its
                     [row-shard × visiting-shard] kernel tile.  Structurally
                     identical to ring attention, with the dataset axis N
                     playing the role of sequence length.
* :mod:`cholesky` -- distributed right-looking blocked Cholesky: panel
                     all-gather over ICI + local MXU trailing-update GEMMs.
* :mod:`solves`   -- distributed blocked triangular solves, transposed
                     solves, and a row-sharded triangular inverse.
* :mod:`adjoint`  -- closed-form sharded adjoint (custom VJP) for the
                     distributed NLML + the N=100k memory plan.
* :mod:`gpr`      -- exact GP regression NLML/predict at N beyond one chip's
                     HBM, composed from the above.
* :mod:`svgp`     -- data-parallel SVGP ELBO (batch sharded, psum'd terms).

Data parallelism for ELBOs can also be had "for free" by jitting the normal
loss with batch-sharded inputs (GSPMD inserts the collectives); the explicit
shard_map paths here exist for the parts GSPMD cannot schedule well (ring
Gram, blocked Cholesky) and to make the communication pattern auditable.
"""

from . import adjoint
from . import cholesky
from . import gram
from . import gpr
from . import mesh
from . import solves
from . import svgp
from . import vecchia

from .mesh import make_mesh
from .gram import ring_gram, sharded_gram
from .cholesky import distributed_cholesky
from .adjoint import make_distributed_nlml, memory_plan
from .gpr import DistributedGPR
from .svgp import dp_svgp_loss
from .vecchia import make_sharded_vecchia_nlml

__all__ = [
    "adjoint",
    "cholesky",
    "gram",
    "gpr",
    "mesh",
    "solves",
    "svgp",
    "make_mesh",
    "ring_gram",
    "sharded_gram",
    "distributed_cholesky",
    "make_distributed_nlml",
    "memory_plan",
    "DistributedGPR",
    "dp_svgp_loss",
]
