"""A minimal pytree-native module system.

The reference builds on ``torch.nn.Module`` (gptorch/model.py:33): a mutable
object tree whose parameters are discovered by attribute walking, with a
scipy bridge that flattens/unflattens parameters to a single vector
(model.py:56-133).

TPU-native design: a :class:`Module` is a registered pytree.  Attributes are
sorted into two groups on assignment:

* **dynamic** (pytree children): :class:`~gptorch_tpu.param.Param` instances,
  nested Modules, and plain arrays (buffers -- e.g. a GP model's ``X``/``Y``
  training data, reference models/base.py:82-85);
* **static** (aux data): everything else (ints, strings, bijectors, Python
  callables...).  Static data is part of the treedef, so jit re-traces when
  it changes and caches when it doesn't.

Because Modules are pytrees, the whole model can be passed through
``jax.jit`` / ``jax.grad`` / ``jax.vmap`` directly; a gradient arrives as a
model-shaped pytree.  For optimizers we provide a named flat view
(:func:`get_trainable` / :func:`with_trainable`) keyed by dotted paths
("kernel.variance", ...) -- the same role as the reference's
``_get_param_array`` / ``_set_parameters`` (model.py:56-82), but functional.
"""

from __future__ import annotations

import inspect
import types
from typing import Any, Callable, Dict, Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .param import Param


def _is_dynamic(value) -> bool:
    return isinstance(value, (Param, Module)) or isinstance(
        value, (jax.Array, np.ndarray)
    )


class Module:
    """Base class for all model components (kernels, likelihoods, GP models).

    Subclasses are automatically registered as pytrees.  Assign Params,
    sub-Modules, and arrays as ordinary attributes; everything else is
    treated as static configuration.
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_node(
            cls,
            lambda m: m.tree_flatten(),
            cls.tree_unflatten,
        )

    def __new__(cls, *args, **kwargs):
        obj = super().__new__(cls)
        object.__setattr__(obj, "_dynamic", {})
        object.__setattr__(obj, "_static", {})
        return obj

    # -- attribute routing ---------------------------------------------------

    def __setattr__(self, name: str, value: Any):
        # Only the two internal containers live on the instance itself;
        # every user attribute is routed so it survives pytree flattening.
        if name in ("_dynamic", "_static"):
            object.__setattr__(self, name, value)
            return
        # Routed instance entries shadow class attributes in
        # __getattribute__ (intended for data defaults like
        # ``quadrature_order``); refuse to shadow methods/properties, where
        # shadowing is almost certainly a bug and would fail confusingly
        # at the call site.
        cls_attr = inspect.getattr_static(type(self), name, None)
        if isinstance(
            cls_attr,
            (property, types.FunctionType, classmethod, staticmethod),
        ):
            raise AttributeError(
                f"cannot assign instance attribute {name!r}: it would "
                f"shadow {type(self).__name__}.{name} "
                f"({type(cls_attr).__name__})"
            )
        if _is_dynamic(value):
            self._static.pop(name, None)
            if isinstance(value, np.ndarray):
                value = jnp.asarray(value)
            self._dynamic[name] = value
        else:
            self._dynamic.pop(name, None)
            self._static[name] = value

    def __getattribute__(self, name: str):
        # Routed (instance) attributes must SHADOW class-level defaults --
        # plain __getattr__ is only called when normal lookup fails, so a
        # class attribute like ``Likelihood.quadrature_order = 20`` would
        # silently win over an instance override stored in _static.
        if not name.startswith("__") and name not in ("_dynamic", "_static"):
            d = object.__getattribute__(self, "__dict__")
            dyn = d.get("_dynamic")
            if dyn is not None and name in dyn:
                return dyn[name]
            sta = d.get("_static")
            if sta is not None and name in sta:
                return sta[name]
        return object.__getattribute__(self, name)

    def __getattr__(self, name: str):
        # Only called when normal lookup fails.
        raise AttributeError(f"{type(self).__name__} has no attribute {name!r}")

    def __delattr__(self, name: str):
        if name in self._dynamic:
            del self._dynamic[name]
        elif name in self._static:
            del self._static[name]
        else:
            object.__delattr__(self, name)

    # -- pytree protocol -----------------------------------------------------

    def tree_flatten(self):
        keys = tuple(self._dynamic.keys())
        children = tuple(self._dynamic.values())
        static = tuple(self._static.items())
        return children, (keys, static)

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, static = aux
        obj = object.__new__(cls)
        object.__setattr__(obj, "_dynamic", dict(zip(keys, children)))
        object.__setattr__(obj, "_static", dict(static))
        return obj

    # -- parameter access ----------------------------------------------------

    def named_parameters(self, prefix: str = "") -> Iterator[Tuple[str, Param]]:
        """Yield (dotted_path, Param) pairs, depth-first in insertion order.

        Analog of torch's named_parameters as used by the reference scipy
        bridge (model.py:106-120).
        """
        for name, child in self._dynamic.items():
            path = f"{prefix}{name}"
            if isinstance(child, Param):
                yield path, child
            elif isinstance(child, Module):
                yield from child.named_parameters(prefix=path + ".")

    def parameters(self) -> List[Param]:
        return [p for _, p in self.named_parameters()]

    def _replace_child(self, path: str, new_value):
        """Return a copy of self with the child at dotted ``path`` replaced."""
        head, _, rest = path.partition(".")
        children = dict(self._dynamic)
        if rest:
            children[head] = children[head]._replace_child(rest, new_value)
        else:
            children[head] = new_value
        obj = object.__new__(type(self))
        object.__setattr__(obj, "_dynamic", children)
        object.__setattr__(obj, "_static", dict(self._static))
        return obj

    def replace(self, **updates) -> "Module":
        """Functional attribute update: returns a copy with attrs replaced."""
        obj = object.__new__(type(self))
        object.__setattr__(obj, "_dynamic", dict(self._dynamic))
        object.__setattr__(obj, "_static", dict(self._static))
        for k, v in updates.items():
            obj.__setattr__(k, v)
        return obj

    def _adopt(self, other: "Module") -> "Module":
        """Copy another instance's pytree state into self (the in-place
        update every mutating convenience method performs after
        functional training/updating).  Returns self."""
        object.__setattr__(self, "_dynamic", dict(other._dynamic))
        object.__setattr__(self, "_static", dict(other._static))
        return self

    # -- priors ----------------------------------------------------------------

    def log_prior(self):
        """Sum of prior log-probs over all parameters that carry a prior.

        PARITY QUIRK (kept deliberately): like the reference
        (model.py:158-177), the prior is evaluated on the *constrained*
        value with no change-of-variables Jacobian term.  MAP estimates in
        unconstrained space are therefore biased exactly as the reference's
        are.  Use ``Param.bijector.forward_log_det_jacobian`` if you want the
        corrected objective.
        """
        total = jnp.zeros((), dtype=jnp.result_type(float))
        for _, p in self.named_parameters():
            if p.prior is not None:
                total = total + jnp.sum(p.prior.log_prob(p.value))
        return total

    # -- verification / placement ----------------------------------------------

    def gradcheck(self, eps=1e-6, atol=1e-5, rtol=1e-3, order=1):
        """Finite-difference check of the loss gradient (analog of reference
        Model.gradcheck, model.py:199-217, built on torch.autograd.gradcheck;
        here on jax.test_util.check_grads).  Returns True or raises."""
        from jax.test_util import check_grads

        values = get_trainable(self)
        check_grads(
            lambda v: with_trainable(self, v)._loss(),
            (values,),
            order=order,
            modes=["rev"],
            eps=eps,
            atol=atol,
            rtol=rtol,
        )
        return True

    def to_device(self, device) -> "Module":
        """Move every leaf to ``device`` (functional analog of the
        reference's .cuda()/.cpu(), models/base.py:392-416)."""
        import jax

        return jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, device), self
        )

    # -- repr ------------------------------------------------------------------

    def __repr__(self):
        lines = [type(self).__name__ + "("]
        for name, child in self._dynamic.items():
            child_repr = repr(child)
            if "\n" in child_repr:
                child_repr = child_repr.replace("\n", "\n  ")
            lines.append(f"  ({name}): {child_repr}")
        lines.append(")")
        return "\n".join(lines)


# -- flat named views (optimizer / scipy bridge) --------------------------------


def get_trainable(module: Module) -> Dict[str, jax.Array]:
    """Unconstrained raw values of all trainable Params, keyed by dotted path.

    The returned dict is itself a pytree -- feed it to jax.grad / optax.
    Role analog: reference ``Model._get_param_array`` (model.py:56-65), minus
    the flattening-to-one-vector (see :func:`pack_vector`).
    """
    return {
        path: p.raw for path, p in module.named_parameters() if p.trainable
    }


def with_trainable(module: Module, values: Dict[str, jax.Array]) -> Module:
    """Return a copy of ``module`` with trainable Param raws replaced from
    ``values`` (inverse of :func:`get_trainable`; analog of
    ``Model._set_parameters``, model.py:67-82)."""
    out = module
    for path, p in module.named_parameters():
        if p.trainable and path in values:
            out = out._replace_child(path, p.with_raw(values[path]))
    return out


def pack_vector(values: Dict[str, jax.Array]) -> np.ndarray:
    """Flatten a trainable dict to a single float64 numpy vector (sorted by
    key) for scipy optimizers -- reference model.py:56-65 flattens the same
    way via parameter iteration order; we sort for determinism."""
    if not values:
        return np.zeros((0,), dtype=np.float64)
    return np.concatenate(
        [np.asarray(values[k], dtype=np.float64).ravel() for k in sorted(values)]
    )


def unpack_vector(
    vector: np.ndarray, like: Dict[str, jax.Array]
) -> Dict[str, jax.Array]:
    """Inverse of :func:`pack_vector`."""
    out = {}
    idx = 0
    for k in sorted(like):
        template = like[k]
        size = int(np.prod(jnp.shape(template))) if jnp.shape(template) else 1
        chunk = vector[idx : idx + size]
        out[k] = jnp.asarray(
            np.reshape(chunk, jnp.shape(template)), dtype=jnp.result_type(template)
        )
        idx += size
    return out


def tree_map_params(fn: Callable[[Param], Param], module: Module) -> Module:
    """Apply ``fn`` to every Param in the module tree, returning a new tree."""
    out = module
    for path, p in module.named_parameters():
        out = out._replace_child(path, fn(p))
    return out
