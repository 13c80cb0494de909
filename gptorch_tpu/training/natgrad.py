"""Natural-gradient training for SVGP's variational distribution.

No reference analog (the reference trains q(u) by plain gradient descent on
(m, L_q), reference sparse_gpr.py:256-308); this is the standard tool for
variational GPs (Salimbeni, Eleftheriadis & Hensman 2018, "Natural gradients
in practice"): take natural-gradient steps on q(u) = Π_i N(m_i, S) in its
exponential-family coordinates while the hyperparameters take ordinary
optimizer steps.

Math.  The joint density over the dy output dims with SHARED covariance S
(this framework's q(u), matching the reference's single q_L) is an
exponential family with

    natural params      θ₁ = S⁻¹M (m, dy),   θ₂ = -½S⁻¹
    expectation params  η₁ = M,              η₂ = dy·S + M Mᵀ

Natural-gradient step of size γ on (θ₁, θ₂) uses the loss gradients in
EXPECTATION coordinates, obtained from the ordinary (M, S) gradients
(g_M, g_S) by the chain rule through S = (η₂ - η₁η₁ᵀ)/dy:

    dL/dη₁ = g_M - (2/dy)·g_S M
    dL/dη₂ = g_S / dy

    θ₁ ← θ₁ - γ·dL/dη₁        θ₂ ← θ₂ - γ·dL/dη₂
    S  ← -½θ₂⁻¹ = (S⁻¹ + 2γ·g_S/dy)⁻¹        M ← S θ₁

Key property (tested): with a GAUSSIAN likelihood and full batches, ONE
step at γ = 1 lands exactly on the optimal q(u), so the SVGP ELBO equals
the collapsed VFE bound (Titsias 2009) after a single step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..functions import cholesky, trtrs
from ..module import get_trainable, with_trainable

_Q_MEAN = "induced_output_mean"
_Q_CHOL = "induced_output_chol_cov"


def _default_q_groups(model, values):
    """(mean_name, chol_name) q-parameter pairs.  Models DECLARE their
    Gaussian variational distributions via a ``variational_groups``
    attribute (SVGP/LMC/HeteroscedasticSVGP all do); the legacy
    name-sniffing fallback covers external Modules that predate the
    protocol."""
    declared = getattr(model, "variational_groups", None)
    if declared:
        groups = [tuple(g) for g in declared]
        missing = [n for g in groups for n in g if n not in values]
        if missing:
            raise ValueError(
                f"variational_groups names {missing} are not trainable "
                "parameters of the model"
            )
        return groups
    if _Q_MEAN in values and _Q_CHOL in values:
        return [(_Q_MEAN, _Q_CHOL)]
    raise ValueError(
        "make_natgrad_step expects a model declaring its Gaussian "
        "variational distributions via a `variational_groups` attribute "
        "of (mean_name, chol_name) pairs (or the SVGP induced_output_* "
        "trainables)"
    )


def _split_values(values, groups):
    qnames = {name for g in groups for name in g}
    q = {k: values[k] for k in qnames}
    hyper = {k: v for k, v in values.items() if k not in qnames}
    return q, hyper


def _nat_update(M, S, Lq, g_M, g_S, gamma):
    """One natural-gradient step for q = Π_i N(M[:, i], S) (shared S over
    M's columns).  Conditioning: q covariances routinely have κ(S) ~ 1e6+
    (tight posteriors), so everything is computed from TRIANGULAR factors
    -- never cholesky(S @ anything) of a squared matrix in f32."""
    dy = M.shape[1]
    g_S = 0.5 * (g_S + g_S.T)  # symmetrize (jax returns the raw cotangent)
    m_ind = M.shape[0]
    eye = jnp.eye(m_ind, dtype=M.dtype)
    Linv_q = trtrs(eye, Lq)  # Lq⁻¹
    Sinv = Linv_q.T @ Linv_q
    theta1 = Linv_q.T @ (Linv_q @ M)
    d_eta1 = g_M - (2.0 / dy) * (g_S @ M)
    theta1_new = theta1 - gamma * d_eta1
    Sinv_new = Sinv + 2.0 * gamma * g_S / dy
    Sinv_new = 0.5 * (Sinv_new + Sinv_new.T)
    # S_new = Sinv_new⁻¹ = Aᵀ A with A = L_si⁻¹ (triangular inverse);
    # M_new = S_new θ₁ via two GEMMs against A.
    L_sinv = cholesky(Sinv_new)  # jitter-robust (adaptive policy)
    A = trtrs(eye, L_sinv)
    S_new = A.T @ A
    M_new = A.T @ (A @ theta1_new)
    return M_new, S_new


def make_natgrad_step(
    model,
    nat_lr: float = 0.1,
    optimizer: Optional[optax.GradientTransformation] = None,
    q_groups=None,
):
    """Build a jitted combined step: natural gradient on every Gaussian
    variational distribution, ordinary ``optimizer`` (default Adam 1e-2)
    on everything else.  Works for :class:`~gptorch_tpu.models.sparse_gpr.
    SVGP` (shared S over outputs), :class:`~gptorch_tpu.models.multioutput.
    LMC` (stacked per-latent q, vmapped updates), and :class:`~gptorch_tpu.
    models.heteroscedastic.HeteroscedasticSVGP` (two latents) --
    auto-detected from the trainable names, or pass ``q_groups`` as a list
    of (mean_name, chol_name) pairs.

    Returns (step, values, opt_state) with
    ``step(values, opt_state, model, key, nat_lr=None) ->
    (values, opt_state, loss)``; ``values`` is the trainable dict (q params
    stored in their usual raw form so checkpoints and other trainers
    interoperate).  ``nat_lr`` is traced, so callers can anneal or back off
    without recompiling (see :func:`fit_svgp_natgrad`): too-large steps
    under minibatch noise can push S⁻¹ - 2γ·(-g_S)/dy indefinite.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-2)

    values0 = get_trainable(model)
    if q_groups is not None:
        groups = [tuple(g) for g in q_groups]
        param_paths = {path for path, _ in model.named_parameters()}
        bad = [
            n
            for g in groups
            for n in g
            if n not in values0 or n not in param_paths
        ]
        if bad:
            # validate up front: a bad name would otherwise surface as a
            # bare KeyError inside the jitted step (missing chol_bijs entry)
            raise ValueError(
                f"q_groups names {bad} are not trainable parameters of the "
                f"model (trainables: {sorted(values0)})"
            )
    else:
        groups = _default_q_groups(model, values0)
    chol_bijs = {}
    for path, p in model.named_parameters():
        for _, cn in groups:
            if path == cn:
                chol_bijs[cn] = p.bijector
    _, hyper0 = _split_values(values0, groups)
    opt_state = optimizer.init(hyper0)

    def loss_ms(Ms, Ss, hyper, model, key):
        """Loss as a function of the DISTRIBUTION parameters per group."""
        values = dict(hyper)
        for (mn, cn), M, S in zip(groups, Ms, Ss):
            Lq = cholesky(S)  # functions.cholesky vmaps batched inputs
            values[mn] = M
            values[cn] = chol_bijs[cn].inverse(Lq)
        return with_trainable(model, values)._loss(key=key)

    @jax.jit
    def step(values, opt_state, model, key, lr=None):
        gamma = nat_lr if lr is None else lr
        q, hyper = _split_values(values, groups)
        Ms, Ss, Lqs = [], [], []
        for mn, cn in groups:
            M = q[mn]
            Lq = chol_bijs[cn].forward(q[cn])
            S = (
                Lq @ jnp.swapaxes(Lq, -1, -2)
                if Lq.ndim == 3
                else Lq @ Lq.T
            )
            Ms.append(M)
            Ss.append(S)
            Lqs.append(Lq)

        loss, grads = jax.value_and_grad(loss_ms, argnums=(0, 1, 2))(
            Ms, Ss, hyper, model, key
        )
        g_Ms, g_Ss, g_hyper = grads

        values_new = {}
        for (mn, cn), M, S, Lq, g_M, g_S in zip(
            groups, Ms, Ss, Lqs, g_Ms, g_Ss
        ):
            if Lq.ndim == 3:
                # stacked per-latent q: M (m, L), chol (L, m, m) -- each
                # latent is an independent dy=1 distribution; vmap the
                # shared-S update over the latent axis.
                M_new, S_new = jax.vmap(
                    lambda Ml, Sl, Ll, gMl, gSl: _nat_update(
                        Ml, Sl, Ll, gMl, gSl, gamma
                    )
                )(
                    M.T[:, :, None],
                    S,
                    Lq,
                    g_M.T[:, :, None],
                    g_S,
                )
                M_new = M_new[:, :, 0].T
            else:
                M_new, S_new = _nat_update(M, S, Lq, g_M, g_S, gamma)
            values_new[mn] = M_new
            values_new[cn] = chol_bijs[cn].inverse(cholesky(S_new))

        # ordinary step on the hyperparameters
        updates, opt_state2 = optimizer.update(g_hyper, opt_state, hyper)
        hyper_new = optax.apply_updates(hyper, updates)
        values_new.update(hyper_new)
        return values_new, opt_state2, loss

    return step, values0, opt_state


def fit_svgp_natgrad(
    model,
    n_steps: int = 200,
    nat_lr: float = 0.1,
    optimizer: Optional[optax.GradientTransformation] = None,
    key: Optional[jax.Array] = None,
):
    """Convenience loop with automatic step-size backoff; returns
    (trained_model, losses).

    If a step drives q(u) off the positive-definite cone (non-finite loss
    at the next evaluation -- the stochastic-natgrad failure mode), the
    update is rolled back and γ halved; γ is traced, so backoff costs no
    recompilation."""
    import numpy as np

    step, values, opt_state = make_natgrad_step(model, nat_lr, optimizer)
    if key is None:
        key = jax.random.PRNGKey(0)
    gamma = float(nat_lr)
    prev = (values, opt_state)
    losses = np.zeros(n_steps)
    i = 0
    while i < n_steps:
        new_values, new_opt_state, loss = step(
            values, opt_state, model, jax.random.fold_in(key, i),
            jnp.asarray(gamma),
        )
        lval = float(loss)
        if not np.isfinite(lval):
            # current (values) already broken by the previous accept:
            # roll back one step and halve the natural step size.
            gamma *= 0.5
            if gamma < 1e-5:
                raise FloatingPointError(
                    "natural-gradient step size collapsed below 1e-5 "
                    "without recovering a finite loss; check the model/"
                    "likelihood scales"
                )
            values, opt_state = prev
            continue
        losses[i] = lval
        prev = (values, opt_state)
        values, opt_state = new_values, new_opt_state
        i += 1
    return with_trainable(model, values), losses
