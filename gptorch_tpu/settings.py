"""Global configuration for gptorch_tpu.

The reference keeps a single global (``DefaultPositiveTransform = ExpTransform``,
reference ``gptorch/settings.py:7``) plus a hard-wired float64 dtype policy
(``gptorch/util.py:11-12``).  Here the same decisions live in one small,
mutable-but-explicit config object:

* ``positive_bijector``  -- name of the bijector used for positive-constrained
  parameters (kernel variances, length scales, likelihood noise).  ``"exp"``
  matches the reference exactly.
* dtype policy           -- JAX-native: we compute in ``default_float()``, which
  is float64 when ``jax_enable_x64`` is on (the parity/test path) and float32
  otherwise (the TPU production path).
* jitter policy          -- the reference retries failed Cholesky factorizations
  with escalating *absolute* jitter ``10**(-10+i), i=0..9``
  (``gptorch/functions.py:20-43``).  Exceptions don't exist on-device, so the
  TPU build re-expresses this as a NaN-probe + ``lax.while_loop`` escalation
  (see :mod:`gptorch_tpu.functions`).  The schedule is configurable here.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Config:
    # Name of the default bijector constraining positive parameters.
    # "exp" matches reference gptorch/settings.py:7 (ExpTransform).
    positive_bijector: str = "exp"

    # Cholesky jitter policy: "adaptive" reproduces the reference's escalating
    # retry loop; "fixed" adds a single relative jitter (fast path, 1 chol);
    # "none" factors the matrix as-is.
    jitter_policy: str = "adaptive"

    # Relative jitter used by the "fixed" policy (scaled by mean diagonal).
    fixed_jitter: float = 1e-6

    # Adaptive schedule: absolute jitters 10**(-max_tries+i), i = 0..max_tries-1,
    # tried after the un-jittered attempt; matches functions.py:34-42.
    max_jitter_tries: int = 10

    # Default RNG seed for convenience APIs that do not take an explicit key
    # (e.g. predict_f_samples without a key).  Incremented on use.
    default_seed: int = 0


config = Config()


def default_float() -> jnp.dtype:
    """The library-wide default float dtype.

    float64 when x64 is enabled (parity with the reference's DoubleTensor
    policy, gptorch/util.py:11-12); float32 otherwise (TPU production).
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@contextlib.contextmanager
def override(**kwargs):
    """Temporarily override config fields.

    >>> with settings.override(jitter_policy="fixed"):
    ...     ...
    """
    old = {k: getattr(config, k) for k in kwargs}
    try:
        for k, v in kwargs.items():
            if not hasattr(config, k):
                raise AttributeError(f"No config field {k!r}")
            setattr(config, k, v)
        yield config
    finally:
        for k, v in old.items():
            setattr(config, k, v)


def trace_key() -> tuple:
    """The config fields that jitted numerics read at TRACE time (the
    jitter policy family, functions.py).  Any module-level cache of a
    jitted callable whose trace touches :func:`gptorch_tpu.functions`
    must include this tuple in its cache key, or a later call under
    ``settings.override`` silently reuses a program compiled with the
    OLD settings."""
    return (
        config.jitter_policy,
        float(config.fixed_jitter),
        int(config.max_jitter_tries),
    )


def next_default_key() -> jax.Array:
    """A convenience PRNG key for APIs mirroring the reference's implicit
    global RNG (e.g. torch.randn in predict_f_samples, models/base.py:372).

    Explicit keys are always preferred; this exists for API parity only.
    """
    key = jax.random.PRNGKey(config.default_seed)
    config.default_seed += 1
    return key
