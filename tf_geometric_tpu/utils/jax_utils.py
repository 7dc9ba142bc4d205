"""Compilation decorator (counterpart of the reference's ``tf_utils.function``
shim, utils/tf_utils.py:26-29): ``@function`` is ``jax.jit`` with static
keyword handling for the common layer-call signature (training/cache are
Python-level)."""
from __future__ import annotations

import functools

import jax

__all__ = ["function"]


def function(fn=None, **jit_kwargs):
    """``@function`` or ``@function(static_argnums=...)`` → jax.jit."""
    if fn is not None and callable(fn):
        return jax.jit(fn)

    def decorate(f):
        return jax.jit(f, **jit_kwargs)

    return decorate
