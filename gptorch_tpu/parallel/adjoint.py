"""Closed-form sharded adjoint for the distributed exact-GPR NLML.

Round 1 differentiated :func:`~gptorch_tpu.parallel.gpr.distributed_gpr_nlml`
by autodiff THROUGH the shard_map bodies -- O(n²) residuals per primitive
per step, which OOMs long before the BASELINE.md N=100k stretch.  This
module is the distributed analog of :mod:`gptorch_tpu.ops.gpr_fast`: one
custom VJP around the whole NLML whose backward pass is built from the same
O(n³/p)-per-device GEMM-rich collectives as the forward pass.

Math (identical to ops/gpr_fast.py, reference GPML Alg 2.1 / gpr.py:47-67):

    forward:  K = K_θ(X,X) + (σ_n² + jitter)·I   (ring Gram, row-sharded)
              L = distributed_cholesky(K),  α = L⁻¹Y,  logdet = Σ log diag L
    backward: A = L⁻ᵀα = K⁻¹Y                       (distributed solves)
              L⁻¹ row-sharded                       (distributed trtri)
              K⁻¹ streamed in row chunks: rows R of K⁻¹ = psum_j
                  (L⁻¹_j)[:, R]ᵀ (L⁻¹_j)            (each device uses only
                                                     its own L⁻¹ rows)
              W_R = dy·K⁻¹[R,:] - A[R] Aᵀ
              ∂NLML/∂θ  = ½ Σ_R ⟨W_R, ∂K[R,:]/∂θ⟩  -- the O(n²d) kernel
                  Gram rows are REBUILT per chunk and autodiffed (jax.vjp of
                  kernel.K on the chunk), so the adjoint generalizes to ANY
                  kernel pytree with no hand-derived radial forms, while the
                  O(n³) factor/inverse pieces stay closed-form.
              ∂NLML/∂σ_n² = ½·(dy·tr K⁻¹ - ‖A‖²)

The jitter is a static stabilizer treated as constant in the adjoint.
Data cotangents (x, y) are zeros -- X/Y are buffers, never Params.

Memory (the N=100k design constraint; see :func:`memory_plan`): with
slab = n·(n/p) elements per device, the phase peaks are
    gram+chol ≈ 3 slabs   (in-place column overwrite + gathered panel)
    trtri     ≈ 3 slabs   (L shard + accumulator-as-output + broadcast blk)
    contract  ≈ 1 slab + ~4 row chunks (cs·n each)
so the peak is the 3-slab phases: n=100k f32 on 8×v5e = 3·(100000²/8)·4 B
= 15.0 GB/device against 15.75 GB usable -- feasible (tight), and
comfortable on 16 devices.  The plan assumes XLA's liveness-accurate buffer
reuse across phases (K's buffer becomes L's; L is dead before the
contraction) -- the compile-time allocation report names any violation
(CLAUDE.md HBM quirk).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .cholesky import distributed_cholesky
from .gram import ring_gram
from .solves import (
    add_diagonal,
    distributed_logdet_tril,
    distributed_tri_solve,
    distributed_tri_solve_T,
    distributed_trtri,
)

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _chunk_size(nb: int, target: int = 4096) -> int:
    """Largest divisor of nb that is ≤ target (row-chunk for the streamed
    contraction)."""
    if nb <= target:
        return nb
    for k in range(-(-nb // target), nb + 1):
        if nb % k == 0:
            return nb // k
    return nb  # pragma: no cover


def _contract_body(linv_local, A, x, kernel, *, axis, p, nb, cs, dy):
    """Streamed W-contraction (see module docstring).  Runs replicated
    chunk math on every device (the redundant-panel tradeoff of
    distributed_cholesky): x and A are replicated, so each chunk's kernel
    vjp is SPMD-uniform and needs no psum."""
    n = p * nb
    tr_kinv = jnp.zeros((), dtype=linv_local.dtype)
    cot_acc = None
    for c in range(n // cs):
        lo = c * cs
        # rows [lo, lo+cs) of K⁻¹ = Σ_dev (L⁻¹_dev)[:, lo:lo+cs]ᵀ (L⁻¹_dev)
        contrib = jnp.matmul(
            linv_local[:, lo : lo + cs].T,
            linv_local,
            preferred_element_type=linv_local.dtype,
        )
        kinv_c = lax.psum(contrib, axis)  # (cs, n), replicated
        tr_kinv = tr_kinv + jnp.sum(
            jnp.diagonal(kinv_c[:, lo : lo + cs])
        )
        W_c = dy * kinv_c - jnp.matmul(
            A[lo : lo + cs], A.T, preferred_element_type=A.dtype
        )
        x_c = x[lo : lo + cs]
        _, vjp_fn = jax.vjp(lambda kern: kern.K(x_c, x), kernel)
        (cot,) = vjp_fn(0.5 * W_c)
        cot_acc = (
            cot
            if cot_acc is None
            else jax.tree_util.tree_map(jnp.add, cot_acc, cot)
        )
    return cot_acc, tr_kinv


@lru_cache(maxsize=32)
def make_distributed_nlml(
    mesh: Mesh, axis: str = "sp", jitter: float = 0.0, panel_nb: int = 1024
):
    """Build (and cache) the custom-VJP distributed NLML for a mesh axis.

    Returns ``nlml(kernel, noise_variance, x, y) -> scalar`` where
    ``kernel`` is any :class:`~gptorch_tpu.kernels.Kernel` pytree,
    ``noise_variance`` is the CONSTRAINED Gaussian noise (bijector chain
    differentiates outside), and x (n, d) / y (n, dy) are data (row-sharded
    or replicated; resharded automatically).  n must be divisible by the
    axis size.
    """
    p = mesh.shape[axis]

    def _fwd_value(kernel, noise, x, y):
        n, dy = y.shape
        K = ring_gram(kernel, x, mesh, axis=axis)
        Kyy = add_diagonal(K, noise + jitter, mesh, axis=axis)
        L = distributed_cholesky(Kyy, mesh, axis=axis, panel_nb=panel_nb)
        alpha = distributed_tri_solve(L, y, mesh, axis=axis)
        logdet = distributed_logdet_tril(L, mesh, axis=axis)
        nlml = (
            0.5 * jnp.sum(jnp.square(alpha))
            + dy * logdet
            + 0.5 * dy * n * math.log(2.0 * math.pi)
        )
        return nlml, (L, alpha)

    @jax.custom_vjp
    def nlml(kernel, noise, x, y):
        return _fwd_value(kernel, noise, x, y)[0]

    def fwd(kernel, noise, x, y):
        value, (L, alpha) = _fwd_value(kernel, noise, x, y)
        return value, (kernel, noise, x, y, L, alpha)

    def bwd(res, g):
        kernel, noise, x, y, L, alpha = res
        n, dy = y.shape
        nb = n // p
        cs = _chunk_size(nb)

        A = distributed_tri_solve_T(L, alpha, mesh, axis=axis)  # K⁻¹Y, (n, dy)
        Linv = distributed_trtri(L, mesh, axis=axis)  # row-sharded

        fn = _shard_map(
            lambda ll, a, xx, kern: _contract_body(
                ll, a, xx, kern, axis=axis, p=p, nb=nb, cs=cs, dy=dy
            ),
            mesh=mesh,
            in_specs=(P(axis, None), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        kern_cot, tr_kinv = fn(Linv, A, x, kernel)
        kern_cot = jax.tree_util.tree_map(lambda t: g * t, kern_cot)
        d_noise = g * 0.5 * (dy * tr_kinv - jnp.sum(jnp.square(A)))
        return (kern_cot, d_noise, jnp.zeros_like(x), jnp.zeros_like(y))

    nlml.defvjp(fwd, bwd)
    return nlml


GiB = 1024**3


def memory_plan(n: int, p: int, itemsize: int = 4, hbm_gb: float = 15.75):
    """Analytic per-device HBM plan for the distributed NLML+gradient.

    Returns a dict of phase peaks in bytes plus ``fits`` against
    ``hbm_gb``.  slab = n·(n/p) elements; phase counts follow the module
    docstring (gram+chol 3 slabs, trtri 3 slabs, contraction 1 slab +
    4 row-chunks).  Used by tests to assert the BASELINE.md N=100k stretch
    fits 8×16 GB v5e, and by users to size meshes.
    """
    nb = n // p
    cs = _chunk_size(nb)
    slab = n * nb * itemsize
    misc = (n * 16 + n * 8) * itemsize  # x/y/A/alpha at d,dy ≤ 16 + slack
    phases = {
        "gram_chol": 3 * slab + misc,
        "trtri": 3 * slab + misc,
        "contraction": 1 * slab + 4 * cs * n * itemsize + misc,
    }
    peak = max(phases.values())
    return {
        "slab_bytes": slab,
        "phases": phases,
        "peak_bytes": peak,
        "peak_gb": peak / GiB,
        "fits": peak <= hbm_gb * GiB,
    }
