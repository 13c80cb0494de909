"""Multi-device sharding tests, run on an 8-virtual-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8).

These validate the TPU scale-out layer the reference entirely lacks
(SURVEY.md §2.3): ring Gram assembly, distributed blocked Cholesky,
distributed triangular solves, end-to-end distributed exact-GPR NLML with
gradients through the collectives, and data-parallel SVGP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sl

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR, SVGP
from gptorch_tpu.module import get_trainable, with_trainable
from gptorch_tpu.parallel import (
    DistributedGPR,
    distributed_cholesky,
    dp_svgp_loss,
    make_mesh,
    ring_gram,
    sharded_gram,
)
from gptorch_tpu.parallel.solves import (
    add_diagonal,
    distributed_logdet_tril,
    distributed_tri_solve,
)
from gptorch_tpu.parallel.svgp import fit_dp_svgp


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((8,), ("sp",))


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    return rng.randn(64, 3), rng.randn(64, 2)


class TestRingGram:
    def test_matches_single_device(self, mesh, data):
        x, _ = data
        for ktype, tol in [
            (kernels.Rbf, 1e-12),
            # √r² at r=0 amplifies eps-level cancellation noise to √eps on
            # the diagonal for non-smooth kernels; 1e-7 is the f64 floor.
            (kernels.Matern32, 1e-7),
            (kernels.Exp, 1e-7),
        ]:
            k = ktype(3, ARD=True, length_scales=np.asarray([0.5, 1.0, 2.0]))
            K = ring_gram(k, jnp.asarray(x), mesh)
            Kref = k.K(jnp.asarray(x))
            assert np.asarray(K) == pytest.approx(np.asarray(Kref), abs=tol)

    def test_sharded_gram_gspmd(self, mesh, data):
        x, _ = data
        k = kernels.Rbf(3)
        K = sharded_gram(k, jnp.asarray(x), mesh)
        assert np.asarray(K) == pytest.approx(np.asarray(k.K(jnp.asarray(x))))

    def test_grad_through_ring(self, mesh, data):
        x, _ = data
        k = kernels.Rbf(3)

        def f_ring(kern):
            return jnp.sum(ring_gram(kern, jnp.asarray(x), mesh))

        def f_ref(kern):
            return jnp.sum(kern.K(jnp.asarray(x)))

        g1 = jax.grad(f_ring)(k)
        g2 = jax.grad(f_ref)(k)
        assert np.asarray(g1.variance.raw) == pytest.approx(
            np.asarray(g2.variance.raw)
        )
        assert np.asarray(g1.length_scales.raw) == pytest.approx(
            np.asarray(g2.length_scales.raw)
        )

    def test_rejects_indivisible(self, mesh):
        with pytest.raises(ValueError):
            ring_gram(kernels.Rbf(2), jnp.zeros((63, 2)), mesh)


class TestDistributedCholesky:
    def test_matches_lapack(self, mesh):
        rng = np.random.RandomState(1)
        A = rng.randn(64, 64)
        A = A @ A.T + 64 * np.eye(64)
        L = distributed_cholesky(jnp.asarray(A), mesh)
        # lower_only semantics: the factorization is in place, so blocks
        # above the diagonal hold leftovers of A (never read downstream).
        assert np.tril(np.asarray(L)) == pytest.approx(
            np.linalg.cholesky(A), abs=1e-10
        )

    def test_solve_and_logdet(self, mesh):
        rng = np.random.RandomState(2)
        A = rng.randn(64, 64)
        A = A @ A.T + 64 * np.eye(64)
        b = rng.randn(64, 3)
        L = distributed_cholesky(jnp.asarray(A), mesh)
        x = distributed_tri_solve(L, jnp.asarray(b), mesh)
        Lref = np.linalg.cholesky(A)
        assert np.asarray(x) == pytest.approx(
            sl.solve_triangular(Lref, b, lower=True), abs=1e-10
        )
        assert float(distributed_logdet_tril(L, mesh)) == pytest.approx(
            np.sum(np.log(np.diag(Lref)))
        )

    def test_add_diagonal(self, mesh):
        A = jnp.asarray(np.random.RandomState(3).randn(64, 64))
        out = add_diagonal(A, 2.5, mesh)
        assert np.asarray(out) == pytest.approx(np.asarray(A) + 2.5 * np.eye(64))


class TestDistributedGPR:
    def test_nlml_matches_single_device(self, mesh, data):
        x, y = data
        k = kernels.Rbf(3)
        lik = likelihoods.Gaussian(variance=0.1)
        dm = DistributedGPR(x, y, k, lik, mesh)
        sm = GPR(x, y, k, likelihood=lik)
        assert float(dm.log_likelihood()) == pytest.approx(
            float(sm.log_likelihood()), rel=1e-12
        )

    def test_grads_match_single_device(self, mesh, data):
        x, y = data
        k = kernels.Rbf(3)
        lik = likelihoods.Gaussian(variance=0.1)
        dm = DistributedGPR(x, y, k, lik, mesh)
        sm = GPR(x, y, k, likelihood=lik)
        loss, grads = dm.loss_and_grad()
        g_ref = jax.grad(lambda v: with_trainable(sm, v)._loss())(
            get_trainable(sm)
        )
        assert float(loss) == pytest.approx(float(sm.loss()), rel=1e-12)
        for key in g_ref:
            assert np.asarray(grads[key]) == pytest.approx(
                np.asarray(g_ref[key]), rel=1e-8, abs=1e-10
            )


class TestDataParallelSVGP:
    def test_dp_loss_matches(self, mesh):
        rng = np.random.RandomState(0)
        x = rng.randn(64, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(64, 1)
        model = SVGP(x, y, kernels.Rbf(2), num_inducing_points=8)
        dp = float(dp_svgp_loss(model, model.X, model.Y, mesh, axis="sp"))
        single = float(model.loss())
        assert dp == pytest.approx(single, rel=1e-10)

    def test_dp_training_reduces_loss(self, mesh):
        rng = np.random.RandomState(0)
        x = rng.randn(64, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(64, 1)
        model = SVGP(x, y, kernels.Rbf(2), num_inducing_points=8)
        l0 = float(model.loss())
        trained, losses = fit_dp_svgp(model, mesh, axis="sp", n_steps=20)
        assert losses[-1] < l0


class TestDistributedGPRPredict:
    def test_predict_matches_single_device(self, mesh, data):
        x, y = data
        k = kernels.Rbf(3)
        lik = likelihoods.Gaussian(variance=0.1)
        dm = DistributedGPR(x, y, k, lik, mesh)
        sm = GPR(x, y, k, likelihood=lik)
        x_test = np.random.RandomState(9).randn(5, 3)
        mu_d, var_d = dm.predict_f(x_test)
        mu_s, var_s = sm.predict_f(x_test)
        assert mu_d == pytest.approx(mu_s, rel=1e-9, abs=1e-11)
        assert var_d == pytest.approx(var_s, rel=1e-8, abs=1e-11)
        # full covariance + predict_y
        mu_df, cov_df = dm.predict_y(x_test, diag=False)
        mu_sf, cov_sf = sm.predict_y(x_test, diag=False)
        assert cov_df == pytest.approx(cov_sf, rel=1e-7, abs=1e-10)


class TestDistributedSolvesT:
    def test_tri_solve_T(self, mesh):
        from gptorch_tpu.parallel.solves import distributed_tri_solve_T

        rng = np.random.RandomState(4)
        A = rng.randn(64, 64)
        A = A @ A.T + 64 * np.eye(64)
        b = rng.randn(64, 3)
        L = distributed_cholesky(jnp.asarray(A), mesh)
        x = distributed_tri_solve_T(L, jnp.asarray(b), mesh)
        Lref = np.linalg.cholesky(A)
        assert np.asarray(x) == pytest.approx(
            sl.solve_triangular(Lref.T, b, lower=False), abs=1e-10
        )

    def test_trtri_row_sharded(self, mesh):
        from gptorch_tpu.parallel.solves import distributed_trtri

        rng = np.random.RandomState(5)
        A = rng.randn(64, 64)
        A = A @ A.T + 64 * np.eye(64)
        L = distributed_cholesky(jnp.asarray(A), mesh)
        Linv = distributed_trtri(L, mesh)
        assert np.asarray(Linv) == pytest.approx(
            np.linalg.inv(np.linalg.cholesky(A)), abs=1e-10
        )


class TestScaleHardenedDistributedGPR:
    """VERDICT round-1 item 2: the distributed stack at non-toy scale.

    n=4096 over 8 devices (nb=512 local panels), NLML+grad parity against
    the single-chip fused path, with the closed-form sharded adjoint
    (no autodiff-through-shard_map residuals)."""

    @pytest.fixture(scope="class")
    def big(self):
        rng = np.random.RandomState(11)
        x = rng.randn(4096, 4)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(4096, 1)
        return x, y

    def test_nlml_and_grads_match_fused_single_device(self, mesh, big):
        x, y = big
        k = kernels.Rbf(4, ARD=True)
        lik = likelihoods.Gaussian(variance=0.1)
        dm = DistributedGPR(x, y, k, lik, mesh)
        sm = GPR(x, y, k, likelihood=lik, fast=True, fast_block=1024)

        loss_d, grads_d = dm.loss_and_grad()
        g_ref = jax.grad(lambda v: with_trainable(sm, v)._loss())(
            get_trainable(sm)
        )
        assert float(loss_d) == pytest.approx(float(sm.loss()), rel=1e-10)
        for key in g_ref:
            assert np.asarray(grads_d[key]) == pytest.approx(
                np.asarray(g_ref[key]), rel=1e-7, abs=1e-9
            )

    def test_matern_kernel_adjoint_generality(self, mesh, big):
        """The sharded adjoint autodiffs the Gram rebuild, so it must work
        for any kernel -- spot-check Matern32 at n=4096."""
        x, y = big
        k = kernels.Matern32(4)
        lik = likelihoods.Gaussian(variance=0.1)
        dm = DistributedGPR(x, y, k, lik, mesh)
        sm = GPR(x, y, k, likelihood=lik, fast=True, fast_block=1024)
        loss_d, grads_d = dm.loss_and_grad()
        g_ref = jax.grad(lambda v: with_trainable(sm, v)._loss())(
            get_trainable(sm)
        )
        assert float(loss_d) == pytest.approx(float(sm.loss()), rel=1e-10)
        for key in g_ref:
            assert np.asarray(grads_d[key]) == pytest.approx(
                np.asarray(g_ref[key]), rel=1e-6, abs=1e-8
            )

    def test_parity_at_8192(self, mesh):
        """VERDICT round-3 item 6: raise the distributed-dense correctness
        ceiling to n=8192 (16 local panels of 512 per device) -- stresses
        block-boundary indexing and long accumulation chains the n=4096
        case (8 panels) cannot."""
        rng = np.random.RandomState(13)
        x = rng.randn(8192, 3)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(8192, 1)
        k = kernels.Rbf(3)
        lik = likelihoods.Gaussian(variance=0.1)
        dm = DistributedGPR(x, y, k, lik, mesh)
        sm = GPR(x, y, k, likelihood=lik, fast=True, fast_block=1024)

        loss_d, grads_d = dm.loss_and_grad()
        g_ref = jax.grad(lambda v: with_trainable(sm, v)._loss())(
            get_trainable(sm)
        )
        assert float(loss_d) == pytest.approx(float(sm.loss()), rel=1e-9)
        for key in g_ref:
            assert np.asarray(grads_d[key]) == pytest.approx(
                np.asarray(g_ref[key]), rel=1e-6, abs=1e-8
            )

    def test_memory_plan_100k_fits_8x16(self):
        """BASELINE.md stretch: n=100k f32 exact GPR NLML+grad fits a v5e-8
        (15.75 GB usable HBM per chip) under the documented 3-slab plan."""
        from gptorch_tpu.parallel import memory_plan

        plan = memory_plan(n=100_000, p=8, itemsize=4)
        assert plan["fits"], plan
        assert plan["peak_gb"] < 15.75
        # and with comfortable slack on 16 chips
        assert memory_plan(n=100_000, p=16, itemsize=4)["peak_gb"] < 8.0


class Test2DMesh:
    """VERDICT round-1 item 7: dp×sp on one (2, 4) mesh in the suite, not
    just the dryrun -- DP-SVGP over 'dp' and sp-sharded exact GPR over
    'sp'."""

    @pytest.fixture(scope="class")
    def mesh2d(self):
        return make_mesh((2, 4), ("dp", "sp"))

    def test_sp_gpr_on_2d_mesh(self, mesh2d, data):
        x, y = data
        k = kernels.Rbf(3)
        lik = likelihoods.Gaussian(variance=0.1)
        dm = DistributedGPR(x, y, k, lik, mesh2d, axis="sp")
        sm = GPR(x, y, k, likelihood=lik)
        loss_d, grads_d = dm.loss_and_grad()
        g_ref = jax.grad(lambda v: with_trainable(sm, v)._loss())(
            get_trainable(sm)
        )
        assert float(loss_d) == pytest.approx(float(sm.loss()), rel=1e-10)
        for key in g_ref:
            assert np.asarray(grads_d[key]) == pytest.approx(
                np.asarray(g_ref[key]), rel=1e-8, abs=1e-10
            )

    def test_dp_svgp_on_2d_mesh(self, mesh2d):
        rng = np.random.RandomState(0)
        x = rng.randn(64, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(64, 1)
        model = SVGP(x, y, kernels.Rbf(2), num_inducing_points=8)
        dp = float(dp_svgp_loss(model, model.X, model.Y, mesh2d, axis="dp"))
        assert dp == pytest.approx(float(model.loss()), rel=1e-10)

    def test_both_axes_in_one_step(self, mesh2d):
        """One training step of each family on the same mesh object."""
        rng = np.random.RandomState(1)
        x = rng.randn(64, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(64, 1)
        dm = DistributedGPR(
            x, y, kernels.Rbf(2), likelihoods.Gaussian(0.1), mesh2d, axis="sp"
        )
        loss, grads = dm.loss_and_grad()
        assert np.isfinite(float(loss))
        svgp = SVGP(x, y, kernels.Rbf(2), num_inducing_points=8)
        dp = float(dp_svgp_loss(svgp, svgp.X, svgp.Y, mesh2d, axis="dp"))
        assert np.isfinite(dp)


class TestShardedIterativeGPR:
    """The matrix-free BBMM path composes with GSPMD: row-shard X/Y (and
    the probe seeds) over the mesh and jit -- XLA partitions the slab
    GEMMs and inserts the collectives.  Third scaling route next to the
    explicit shard_map stack (exact GPs at n bounded by O(n·probes)
    vectors per device, not O(n²))."""

    def test_sharded_inputs_match_single_device(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P

        rng = np.random.RandomState(13)
        n, d = 1024, 3
        x = rng.randn(n, d)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)
        mk = lambda xx, yy: GPR(
            xx, yy, kernels.Rbf(d), likelihood=likelihoods.Gaussian(0.1),
            solver="iterative", probes=16, max_cg_iters=150,
            precond_rank=32, cg_tol=1e-12, mvm_slab=128,
        )
        single = mk(x, y)
        shard = NamedSharding(mesh, P("sp", None))
        sharded = mk(
            jax.device_put(single.X, shard), jax.device_put(single.Y, shard)
        )
        sharded.probe_seeds = single.probe_seeds

        ref = float(single.loss())
        values = get_trainable(sharded)
        loss, grads = jax.jit(
            lambda v, m: jax.value_and_grad(
                lambda v: with_trainable(m, v)._loss()
            )(v)
        )(values, sharded)
        assert float(loss) == pytest.approx(ref, rel=1e-9)
        g_ref = jax.grad(lambda v: with_trainable(single, v)._loss())(
            get_trainable(single)
        )
        for k in g_ref:
            assert np.asarray(grads[k]) == pytest.approx(
                np.asarray(g_ref[k]), rel=1e-7, abs=1e-9
            )


class TestDistributedErgonomics:
    """Round-2 VERDICT item 6: DistributedGPR reaches ergonomic parity
    with the single-chip models -- cached posterior, optimize() loop,
    checkpoint round trip, and a compile-time memory check of the
    distributed NLML against memory_plan's slab accounting."""

    def _model(self, mesh, n=256, seed=0):
        rng = np.random.RandomState(seed)
        x = rng.randn(n, 3)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)
        m = DistributedGPR(
            x, y, kernels.Rbf(3, ARD=True), likelihoods.Gaussian(0.1), mesh
        )
        return m, x, y

    def test_cached_posterior_matches_predict(self, mesh):
        m, x, y = self._model(mesh)
        xt = np.random.RandomState(1).randn(6, 3)
        mu0, var0 = m.predict_f(xt)
        post = m.posterior()
        mu1, var1 = post.predict_f(xt)
        assert mu1 == pytest.approx(mu0, abs=1e-10)
        assert var1 == pytest.approx(var0, abs=1e-10)
        # full-covariance + likelihood-noise path
        mu0f, cov0 = m.predict_y(xt, diag=False)
        mu1f, cov1 = post.predict_y(xt, diag=False)
        assert cov1 == pytest.approx(cov0, abs=1e-10)
        # the cached factor reproduces the single-chip dense posterior too
        sc = GPR(
            x, y, kernels.Rbf(3, ARD=True),
            likelihood=likelihoods.Gaussian(0.1), fast=False,
        )
        mu_sc, var_sc = sc.predict_f(xt)
        assert mu1 == pytest.approx(mu_sc, rel=1e-6, abs=1e-8)
        assert var1 == pytest.approx(var_sc, rel=1e-6, abs=1e-8)

    def test_optimize_loop(self, mesh):
        m, _, _ = self._model(mesh)
        losses, wall = m.optimize(
            method="Adam", max_iter=8, verbose=False, learning_rate=0.05
        )
        assert losses[-1] < losses[0]

    def test_checkpoint_round_trip(self, mesh, tmp_path):
        from gptorch_tpu.training import checkpoint

        m, x, y = self._model(mesh)
        m.optimize(method="Adam", max_iter=3, verbose=False)
        p = str(tmp_path / "dist_gpr.npz")
        checkpoint.save_trainable(p, m)
        m2, _, _ = self._model(mesh)
        m2 = checkpoint.load_trainable(p, m2)
        a = float(m.loss_and_grad()[0])
        b = float(m2.loss_and_grad()[0])
        assert b == pytest.approx(a, rel=1e-12)

    def test_compile_time_memory_vs_plan(self, mesh):
        """Lower + compile (NOT run) the distributed NLML and check the
        compiler's own peak-memory estimate against memory_plan's slab
        accounting at the same (n, p): the plan's 3-slab phase peak must
        UPPER-bound the compiled per-device temp allocation (XLA's
        liveness analysis can only do better than the hand plan).  f32,
        n=2048 on p=8 -- same code path as the N=100k program, small
        enough to trace in CI."""
        from gptorch_tpu.parallel.adjoint import make_distributed_nlml, memory_plan

        n, p = 2048, 8
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n, 3), dtype=jnp.float32)
        y = jnp.asarray(rng.randn(n, 1), dtype=jnp.float32)
        kern = kernels.Rbf(3)
        kern = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.float32)
            if hasattr(t, "astype") and t.dtype == jnp.float64
            else t,
            kern,
        )
        nlml = make_distributed_nlml(mesh, "sp")
        fn = jax.jit(
            lambda k, nz, xx, yy: jax.value_and_grad(nlml, argnums=1)(
                k, nz, xx, yy
            )
        )
        compiled = fn.lower(
            kern, jnp.asarray(0.1, jnp.float32), x, y
        ).compile()
        mem = compiled.memory_analysis()
        plan = memory_plan(n, p, itemsize=4)
        # CPU "devices" are threads in one address space: the compiler
        # reports the WHOLE mesh's temps; divide by p for per-device.
        peak_per_dev = getattr(mem, "temp_size_in_bytes", 0) / p
        assert peak_per_dev > 0
        assert peak_per_dev <= plan["peak_bytes"], (
            peak_per_dev, plan["peak_bytes"],
        )
