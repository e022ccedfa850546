"""Numerical-safety subsystem (SURVEY.md §5 'Race detection / sanitizers').

There are no OS-level races in this framework (single-controller JAX);
the failure class that corresponds is NUMERICAL: NaN/Inf escaping a fit,
out-of-range decode, donated-buffer reuse. Tooling:

- :func:`enable_nan_checks` — global ``jax_debug_nans`` toggle for CI.
- :func:`checked` — wrap any jittable fn with ``checkify`` so float
  errors surface as structured errors instead of silent garbage.
- :func:`assert_all_finite` — in-graph guard (checkify-based) used at
  subsystem boundaries (e.g. fit outputs before they feed a mesh export).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enable_nan_checks(enable: bool = True) -> None:
    """Raise on any NaN produced inside jitted code (CI switch)."""
    jax.config.update("jax_debug_nans", enable)


def checked(fn: Callable, *, errors=checkify.float_checks) -> Callable:
    """``fn`` → a function returning (error, result); call
    ``error.throw()`` to raise host-side. Composable with jit/vmap."""
    return checkify.checkify(fn, errors=errors)


def assert_all_finite(x, name: str = "value"):
    """In-graph finiteness guard: use inside a ``checked``-wrapped fn."""
    ok = jnp.all(jnp.isfinite(jnp.asarray(x)))
    checkify.check(ok, f"{name} contains NaN/Inf")
    return x
