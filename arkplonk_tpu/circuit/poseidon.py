"""Poseidon permutation over Fr: host reference + in-circuit gadget.

The reference workspace reserves a `plonk-hashing` crate for this but
ships it empty (SURVEY.md §0: "plonk-hashing is an empty stub"); the
BASELINE bench configs nevertheless call for a Poseidon gadget circuit, so
this module provides one.

Instance: t = 3 (rate 2, capacity 1), x^5 S-box, R_F = 8 full rounds,
R_P = 57 partial rounds (standard 128-bit parameters for a 255-bit field).
Round constants are derived deterministically from SHA-256 (domain
"arkplonk-poseidon"); the MDS matrix is the Cauchy matrix
1/(x_i + y_j).  This is a self-consistent instance (no upstream vectors
exist to match).

Gadget cost: 3 mul gates per S-box (x^2, x^4, x^5) + one fan-in-3 linear
gate per state element per round: ~438 gates per permutation.
"""

from __future__ import annotations

import hashlib

from ..fields.host import R, fr_inv

T = 3
R_F = 8
R_P = 57
N_ROUNDS = R_F + R_P


def _derive_constants():
    consts = []
    i = 0
    while len(consts) < N_ROUNDS * T:
        h = hashlib.sha256(b"arkplonk-poseidon/rc" + i.to_bytes(4, "little"))
        v = int.from_bytes(h.digest() + hashlib.sha256(
            h.digest()).digest(), "little") % R
        consts.append(v)
        i += 1
    return [consts[r * T:(r + 1) * T] for r in range(N_ROUNDS)]


def _derive_mds():
    # Cauchy matrix over distinct x_i, y_j with x_i + y_j != 0
    xs = [i for i in range(T)]
    ys = [T + i for i in range(T)]
    return [[fr_inv((x + y) % R) for y in ys] for x in xs]


ROUND_CONSTANTS = _derive_constants()
MDS = _derive_mds()


def _sbox(x: int) -> int:
    x2 = x * x % R
    x4 = x2 * x2 % R
    return x4 * x % R


def permute(state):
    """Host Poseidon permutation on a length-3 state."""
    s = [x % R for x in state]
    half = R_F // 2
    for r in range(N_ROUNDS):
        s = [(x + c) % R for x, c in zip(s, ROUND_CONSTANTS[r])]
        if r < half or r >= half + R_P:
            s = [_sbox(x) for x in s]
        else:
            s[0] = _sbox(s[0])
        s = [sum(MDS[i][j] * s[j] for j in range(T)) % R for i in range(T)]
    return s


def hash2(a: int, b: int) -> int:
    """2-to-1 sponge hash (rate 2, capacity 1, zero IV)."""
    return permute([a % R, b % R, 0])[0]


def hash_many(inputs) -> int:
    """Absorb pairs; capacity untouched between absorptions."""
    state = [0, 0, 0]
    chunk = []
    items = [x % R for x in inputs]
    if len(items) % 2:
        items.append(0)
    for i in range(0, len(items), 2):
        state[0] = (state[0] + items[i]) % R
        state[1] = (state[1] + items[i + 1]) % R
        state = permute(state)
    return state[0]


# --- gadget ----------------------------------------------------------------

def _sbox_gadget(cs, x):
    x2 = cs.arithmetic_gate((x, x, None), mul=1)
    x4 = cs.arithmetic_gate((x2, x2, None), mul=1)
    return cs.arithmetic_gate((x4, x, None), mul=1)


def permute_gadget(cs, state_vars):
    """In-circuit Poseidon permutation (3 wires in, 3 out)."""
    s = list(state_vars)
    half = R_F // 2
    for r in range(N_ROUNDS):
        rc = ROUND_CONSTANTS[r]
        if r < half or r >= half + R_P:
            sboxed = []
            for i in range(T):
                # x + rc then S-box: fold the constant into the first mul?
                # Keep it simple: one add gate + 3 mul gates.
                xc = cs.arithmetic_gate((s[i], cs.zero_var, None),
                                        add=(1, 0), constant=rc[i])
                sboxed.append(_sbox_gadget(cs, xc))
            s = sboxed
        else:
            xc = cs.arithmetic_gate((s[0], cs.zero_var, None),
                                    add=(1, 0), constant=rc[0])
            s = [_sbox_gadget(cs, xc),
                 cs.arithmetic_gate((s[1], cs.zero_var, None),
                                    add=(1, 0), constant=rc[1]),
                 cs.arithmetic_gate((s[2], cs.zero_var, None),
                                    add=(1, 0), constant=rc[2])]
        # MDS: each output = fan-in-3 linear combination
        s = [cs.arithmetic_gate((s[0], s[1], None),
                                add=(MDS[i][0], MDS[i][1]),
                                fan_in_3=(MDS[i][2], s[2]))
             for i in range(T)]
    return s


def hash2_gadget(cs, a_var, b_var):
    zero = cs.zero_var
    out = permute_gadget(cs, [a_var, b_var, zero])
    return out[0]
