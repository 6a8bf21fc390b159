"""Device circuit debugger (SURVEY.md §5.1).

The reference's `trace` feature re-evaluates the gate identity row by row
on the host (composer.rs:661-814).  Here the same check is ONE vectorized
device pass over all gates: evaluate every widget on the wire/selector
columns, sum, and argmin the first nonzero residual.  O(n) field ops on
device vs O(n) Python rounds on host — usable at production circuit sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.jaxfield import FR
from ..fields.fview import Fv
from ..circuit.composer import SELECTOR_NAMES
from . import device_widgets as dw
from . import pi as pi_mod


def check_circuit_satisfied_device(cs):
    """Returns (ok: bool, first_bad_gate: int). Gate identity is evaluated
    with unit separation challenges (each widget must vanish identically,
    so challenge=1 suffices for satisfaction checking)."""
    n = cs.n
    from .device import _enc_stack

    sels = _enc_stack([list(getattr(cs, s)) + [0] * (n - len(getattr(cs, s)))
                       for s in SELECTOR_NAMES])
    wires = _enc_stack([
        [cs.variables[v] for v in w] + [0] * (n - len(w))
        for w in (cs.w_l, cs.w_r, cs.w_o, cs.w_4)])
    pi_evals = _enc_stack([pi_mod.as_evals(cs.public_inputs, n)])[:, 0]

    residual = _residual_fn()(sels, wires, pi_evals)
    bad = jnp.logical_not(FR.is_zero(residual))
    any_bad = bool(jnp.any(bad))
    first = int(jnp.argmax(bad)) if any_bad else -1
    return (not any_bad, first)


import functools


@functools.lru_cache(maxsize=None)
def _residual_fn():
    @jax.jit
    def f(sels, wires, pi_evals):
        sel = {name: Fv(sels[:, i]) for i, name in enumerate(SELECTOR_NAMES)}
        a, b, c, d = (Fv(wires[:, i]) for i in range(4))

        def nxt(x):
            return Fv(jnp.roll(x.a, -1, axis=-1))

        a_n, b_n, d_n = nxt(a), nxt(b), nxt(d)
        one = Fv(FR.ones((1,)))

        arith = dw.arithmetic(sel["q_m"], sel["q_l"], sel["q_r"],
                              sel["q_o"], sel["q_4"], sel["q_c"],
                              sel["q_arith"], a, b, c, d) + Fv(pi_evals)
        rng = dw.range_constraint(one, a, b, c, d, d_n) * sel["q_range"]
        logic = dw.logic_constraint(one, a, b, c, d, a_n, b_n, d_n,
                                    sel["q_c"]) * sel["q_logic"]
        fbsm = dw.fbsm_constraint(one, a, b, c, d, a_n, b_n, d_n,
                                  sel["q_l"], sel["q_r"], sel["q_c"]) \
            * sel["q_fixed_group_add"]
        ca = dw.ca_constraint(one, a, b, c, d, a_n, b_n, d_n) \
            * sel["q_variable_group_add"]
        return (arith + rng + logic + fbsm + ca).a

    return f
