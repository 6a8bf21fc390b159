"""Operator-overloaded view over Fr limb arrays.

Lets the device widgets (proving/device_widgets.py) read like the host
formulas (proving/widgets.py) while staying pure jnp underneath — overhead
is tracing-time only.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from .jaxfield import FR, U32


@functools.lru_cache(maxsize=None)
def _const_np(k: int):
    import numpy as np
    return np.asarray(FR.encode(k % FR.modulus), dtype=np.uint32)


class Fv:
    """A view of an Fr limb array (Montgomery form) with field operators."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a

    def _coerce(self, o) -> jnp.ndarray:
        if isinstance(o, Fv):
            return o.a
        if isinstance(o, int):
            c = jnp.asarray(_const_np(o))
            return c.reshape((FR.L,) + (1,) * (self.a.ndim - 1))
        raise TypeError(type(o))

    def __add__(self, o):
        return Fv(FR.add(self.a, self._coerce(o)))

    __radd__ = __add__

    def __sub__(self, o):
        return Fv(FR.sub(self.a, self._coerce(o)))

    def __rsub__(self, o):
        return Fv(FR.sub(self._coerce(o), self.a))

    def __mul__(self, o):
        return Fv(FR.mont_mul(self.a, self._coerce(o)))

    __rmul__ = __mul__

    def __neg__(self):
        return Fv(FR.neg(self.a))

    def square(self):
        return Fv(FR.mont_sqr(self.a))


def fv_const(k: int, ndim: int = 2) -> Fv:
    c = jnp.asarray(_const_np(k))
    return Fv(c.reshape((FR.L,) + (1,) * (ndim - 1)))
