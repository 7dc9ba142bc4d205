"""Compilation decorator (counterpart of the reference's ``tf_utils.function``
shim, utils/tf_utils.py:26-29): ``@function`` is ``jax.jit`` with the common
layer-call keywords (``training``/``cache``) marked static by default, so
Python-level branches on them keep working under jit."""
from __future__ import annotations

import inspect

import jax

__all__ = ["function"]

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
