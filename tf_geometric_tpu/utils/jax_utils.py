"""Compilation decorator (counterpart of the reference's ``tf_utils.function``
shim, utils/tf_utils.py:26-29): ``@function`` is ``jax.jit`` with the common
layer-call keywords (``training``/``cache``) marked static by default, so
Python-level branches on them keep working under jit."""
from __future__ import annotations

import inspect

import jax

__all__ = ["function", "split_hybrid_constants"]

_DEFAULT_STATIC_KWARGS = ("training", "cache")


def function(fn=None, **jit_kwargs):
    """``@function`` or ``@function(static_argnums=...)`` → jax.jit.

    Unless the caller sets ``static_argnames`` explicitly, any ``training``
    or ``cache`` keyword in the function's signature is made static (those
    drive Python control flow in every layer-call contract here)."""

    def decorate(f):
        kwargs = dict(jit_kwargs)
        if "static_argnames" not in kwargs:
            try:
                params = inspect.signature(f).parameters
                names = tuple(n for n in _DEFAULT_STATIC_KWARGS if n in params)
            except (TypeError, ValueError):
                names = ()
            if names:
                kwargs["static_argnames"] = names
        return jax.jit(f, **kwargs)

    if fn is not None and callable(fn):
        return decorate(fn)
    return decorate


def split_hybrid_constants(tree):
    """Split a pytree for the HYBRID constants/arguments jit mode.

    Large packed graph layouts run fastest with every array inlined as a jit
    constant (XLA constant-specializes/fuses the index arrays), but past
    ~10M edges the literal HLO exceeds the remote-compile payload limit.
    The measured middle ground (benchmarks/README.md, Reddit section) keeps
    the int32 INDEX arrays — where the constants advantage lives — inlined,
    while float VALUE arrays ride as ordinary jit arguments, shrinking the
    literal payload ~3x.

    Returns ``(val_leaves, rebuild)`` where ``val_leaves`` is the list of
    floating-point leaves (pass them as jit arguments) and ``rebuild`` is a
    function mapping such a list back to the full pytree, capturing every
    non-float leaf by Python closure (→ jit constant when ``rebuild`` is
    called inside a traced function).

    Leaves without a ``.dtype`` (Python scalars etc.) are treated as
    constants. ``rebuild`` captures only the non-float leaves, so the caller's
    float originals can be freed (at Reddit scale they are ~190MB).
    """
    import jax.numpy as jnp
    import jax.tree_util as jtu

    leaves, treedef = jtu.tree_flatten(tree)
    is_val = [hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
              for leaf in leaves]
    val_leaves = [leaf for leaf, f in zip(leaves, is_val) if f]
    const_leaves = [None if f else leaf for leaf, f in zip(leaves, is_val)]

    def rebuild(vals):
        it = iter(vals)
        merged = [next(it) if f else leaf
                  for leaf, f in zip(const_leaves, is_val)]
        return jtu.tree_unflatten(treedef, merged)

    return val_leaves, rebuild
