"""StandardComposer: the width-4 PLONK circuit builder (host front-end).

Re-implements the behavior of the reference's
`constraint_system/composer.rs` (+ the per-gate builder files) with a dense,
array-oriented design: selectors/wires are plain Python lists that convert
directly to the dense device arrays consumed by the TPU kernels (SURVEY.md
§3.4: "a Python front-end that emits dense selector/wire arrays + a sigma
permutation index array").

Wire columns hold `Variable`s = int indices into `self.variables`.
Selector columns hold ints mod r.

Gate semantics mirrored (file:line refs into /root/reference):
- poly_gate / arithmetic_gate      composer.rs:269, arithmetic.rs:103-168
- boolean_gate                     boolean.rs:25-51
- range_gate                       range.rs:27-195
- xor/and (logic_gate)             logic.rs:36-314
- lookup_gate                      lookup.rs:18-65
- ECC gadgets                      ecc/mod.rs, ecc/scalar_mul/*, curve_addition/*
- blinding + zero var              composer.rs:202-247, 580-648
"""

from __future__ import annotations

import os

from ..fields.host import R, fr_inv
from . import jubjub
from .lookup_table import LookupTable

# wire kinds (WireData tags, variable.rs:21-30)
LEFT, RIGHT, OUTPUT, FOURTH = 0, 1, 2, 3

SELECTOR_NAMES = ["q_m", "q_l", "q_r", "q_o", "q_4", "q_c", "q_arith",
                  "q_range", "q_logic", "q_fixed_group_add",
                  "q_variable_group_add", "q_lookup"]

K1, K2, K3 = 7, 13, 17  # permutation coset multipliers (constants.rs:12-22)


class Point:
    """In-circuit affine TE point (ecc/mod.rs:23-73)."""

    __slots__ = ("x", "y")

    def __init__(self, x: int, y: int):
        self.x = x
        self.y = y


def _os_rand_fr() -> int:
    return int.from_bytes(os.urandom(40), "little") % R


class StandardComposer:
    def __init__(self, rng=None):
        """`rng`: zero-arg callable returning a random Fr element (blinding).
        Defaults to OS randomness, mirroring the reference's OsRng; pass a
        deterministic one for reproducible proofs (SURVEY.md §7.3)."""
        self.n = 0
        for s in SELECTOR_NAMES:
            setattr(self, s, [])
        self.w_l: list[int] = []
        self.w_r: list[int] = []
        self.w_o: list[int] = []
        self.w_4: list[int] = []
        self.public_inputs: dict[int, int] = {}
        self.intended_pi_pos: list[int] = []
        self.lookup_table = LookupTable()
        self.variables: list[int] = []          # index -> value
        self.variable_map: list[list[tuple]] = []  # index -> [WireData]
        self._rng = rng if rng is not None else _os_rand_fr

        # Reserve the first variable to be zero (composer.rs:237-239).
        # Pre-set to 0: the struct literal in the reference does the same
        # before the zero witness is actually created.
        self.zero_var = 0
        self.zero_var = self.add_witness_to_circuit_description(0)

        # Blinding rows (composer.rs:241-243)
        self.add_blinding_factors()

    @classmethod
    def with_expected_size(cls, expected_size: int, rng=None):
        """Capacity-hint constructor (composer.rs:202).  Python lists grow
        amortized-O(1), so the hint is recorded but needs no prealloc."""
        cs = cls(rng=rng)
        cs.expected_size = expected_size
        return cs

    # ------------------------------------------------------------------ core

    def total_size(self) -> int:
        return max(self.n, self.lookup_table.size())

    def circuit_bound(self) -> int:
        t = self.total_size()
        return 1 if t == 0 else 1 << (t - 1).bit_length()

    def add_input(self, value: int) -> int:
        var = len(self.variables)
        self.variables.append(value % R)
        self.variable_map.append([])
        return var

    def value(self, var: int) -> int:
        return self.variables[var]

    def add_witness_to_circuit_description(self, value: int) -> int:
        var = self.add_input(value)
        self.constrain_to_constant(var, value, None)
        return var

    def _add_wires_to_map(self, a, b, c, d, gate):
        self.variable_map[a].append((LEFT, gate))
        self.variable_map[b].append((RIGHT, gate))
        self.variable_map[c].append((OUTPUT, gate))
        self.variable_map[d].append((FOURTH, gate))

    def add_pi(self, pos: int, value: int):
        if pos in self.public_inputs:
            raise ValueError(f"PI collision at position {pos}")
        if value % R != 0:
            self.public_inputs[pos] = value % R
        self.intended_pi_pos.append(pos)

    def _push_selectors(self, **kw):
        for s in SELECTOR_NAMES:
            getattr(self, s).append(kw.get(s, 0) % R)

    # ------------------------------------------------------------- poly gate

    def poly_gate(self, a, b, c, q_m, q_l, q_r, q_o, q_c, pi=None):
        """(a*b)*q_m + a*q_l + b*q_r + q_o*c + q_c + PI = 0 (composer.rs:269)."""
        self.w_l.append(a)
        self.w_r.append(b)
        self.w_o.append(c)
        self.w_4.append(self.zero_var)
        self._push_selectors(q_m=q_m, q_l=q_l, q_r=q_r, q_o=q_o, q_c=q_c,
                             q_arith=1)
        if pi is not None:
            self.add_pi(self.n, pi)
        self._add_wires_to_map(a, b, c, self.zero_var, self.n)
        self.n += 1
        return (a, b, c)

    def arithmetic_gate(self, witness, mul=0, add=(0, 0), fan_in_3=None,
                        out=None, constant=0, pi=None):
        """Builder-pattern fan-in-2/3 arithmetic gate (arithmetic.rs:103-168).

        witness: (w_l, w_r, w_o-or-None). out defaults to -1 (q_o)."""
        q_o = (-1) % R if out is None else out % R
        w_l, w_r, w_o = witness
        q4, w4 = fan_in_3 if fan_in_3 is not None else (0, self.zero_var)
        self.w_4.append(w4)
        self.w_l.append(w_l)
        self.w_r.append(w_r)
        self._push_selectors(q_m=mul, q_l=add[0], q_r=add[1], q_4=q4, q_o=q_o,
                             q_c=constant, q_arith=1)
        if pi is not None:
            self.add_pi(self.n, pi)
        if w_o is None:
            val = (mul * self.variables[w_l] * self.variables[w_r]
                   + add[0] * self.variables[w_l]
                   + add[1] * self.variables[w_r]
                   + constant + q4 * self.variables[w4]
                   + (pi or 0)) * (-q_o)
            w_o = self.add_input(val % R)
        self.w_o.append(w_o)
        self._add_wires_to_map(w_l, w_r, w_o, w4, self.n)
        self.n += 1
        return w_o

    def constrain_to_constant(self, a, constant, pi=None):
        self.poly_gate(a, a, a, 0, 1, 0, 0, (-constant) % R, pi)

    def assert_equal(self, a, b):
        self.poly_gate(a, b, self.zero_var, 0, 1, (-1) % R, 0, 0, None)

    # -------------------------------------------------------- derived gates

    def is_zero_with_output(self, a: int) -> int:
        a_value = self.variables[a]
        y_value = fr_inv(a_value) if a_value % R else 1
        b_value = (1 - a_value * y_value) % R
        y = self.add_input(y_value)
        b = self.add_input(b_value)
        zero = self.zero_var
        self.arithmetic_gate((a, b, zero), mul=1)
        self.arithmetic_gate((a, y, zero), mul=1, fan_in_3=(1, b),
                             constant=(-1) % R)
        return b

    def is_eq_with_output(self, a: int, b: int) -> int:
        difference = self.arithmetic_gate((a, b, None), add=(1, (-1) % R))
        return self.is_zero_with_output(difference)

    def conditional_select(self, bit, choice_a, choice_b) -> int:
        zero = self.zero_var
        bit_times_a = self.arithmetic_gate((bit, choice_a, None), mul=1)
        one_min_bit = self.arithmetic_gate((bit, zero, None),
                                           add=((-1) % R, 0), constant=1)
        one_min_bit_b = self.arithmetic_gate((one_min_bit, choice_b, None),
                                             mul=1)
        return self.arithmetic_gate((one_min_bit_b, bit_times_a, None),
                                    add=(1, 1))

    def conditional_select_zero(self, bit, value) -> int:
        return self.arithmetic_gate((bit, value, None), mul=1)

    def conditional_select_one(self, bit, value) -> int:
        value_scalar = self.variables[value]
        bit_scalar = self.variables[bit]
        f_x_scalar = (1 - bit_scalar + bit_scalar * value_scalar) % R
        f_x = self.add_input(f_x_scalar)
        self.poly_gate(bit, value, f_x, 1, (-1) % R, 0, (-1) % R, 1, None)
        return f_x

    def boolean_gate(self, a: int) -> int:
        """a*a - a = 0 (boolean.rs:25-51)."""
        self.w_l.append(a)
        self.w_r.append(a)
        self.w_o.append(a)
        self.w_4.append(self.zero_var)
        self._push_selectors(q_m=1, q_o=(-1) % R, q_arith=1)
        self._add_wires_to_map(a, a, a, self.zero_var, self.n)
        self.n += 1
        return a

    # ------------------------------------------------------------ range gate

    def range_gate(self, witness: int, num_bits: int):
        """Base-4 accumulator range proof (range.rs:27-195)."""
        assert num_bits % 2 == 0

        def add_wire(i: int, variable: int):
            gate_index = self.n + (i // 4)
            col = i % 4
            if col == 0:
                self.w_4.append(variable)
                wd = (FOURTH, gate_index)
            elif col == 1:
                self.w_o.append(variable)
                wd = (OUTPUT, gate_index)
            elif col == 2:
                self.w_r.append(variable)
                wd = (RIGHT, gate_index)
            else:
                self.w_l.append(variable)
                wd = (LEFT, gate_index)
            self.variable_map[variable].append(wd)

        value = self.variables[witness]
        bits = [(value >> i) & 1 for i in range(256)]

        num_gates = num_bits >> 3
        if num_bits % 8 != 0:
            num_gates += 1
        num_quads = num_gates * 4
        pad = 1 + (((num_quads << 1) - num_bits) >> 1)
        used_gates = num_gates + 1

        for i in range(pad):
            add_wire(i, self.zero_var)

        accumulators = []
        accumulator = 0
        for i in range(pad, num_quads + 1):
            bit_index = (num_quads - i) << 1
            q_0 = bits[bit_index]
            q_1 = bits[bit_index + 1]
            quad = q_0 + 2 * q_1
            accumulator = (4 * accumulator + quad) % R
            acc_var = self.add_input(accumulator)
            accumulators.append(acc_var)
            add_wire(i, acc_var)

        for _ in range(used_gates):
            self._push_selectors(q_range=1)
        self.n += used_gates

        # switch off the range constraint for the last gate; pad l/r/o wires
        self.q_range[-1] = 0
        self.w_l.append(self.zero_var)
        self.w_r.append(self.zero_var)
        self.w_o.append(self.zero_var)

        self.assert_equal(accumulators[-1], witness)

    # ------------------------------------------------------------ logic gate

    def _logic_gate(self, a: int, b: int, num_bits: int, is_xor: bool) -> int:
        """Quad-accumulator XOR/AND circuit (logic.rs:36-314)."""
        assert num_bits % 2 == 0
        num_quads = num_bits >> 1

        def top_bits(v: int):
            # to_bits_be() of the 256-bit repr, keeping the low `num_bits`
            # (logic.rs:57-65: skip(256 - num_bits) of big-endian bits)
            return [(v >> (num_bits - 1 - i)) & 1 for i in range(num_bits)]

        a_bits = top_bits(self.variables[a])
        b_bits = top_bits(self.variables[b])

        # first row: w_l = w_r = w_4 = 0, w_o set by first iteration
        self.variable_map[self.zero_var].append((LEFT, self.n))
        self.variable_map[self.zero_var].append((RIGHT, self.n))
        self.variable_map[self.zero_var].append((FOURTH, self.n))
        self.w_l.append(self.zero_var)
        self.w_r.append(self.zero_var)
        self.w_4.append(self.zero_var)
        self.n += 1

        left_acc = right_acc = out_acc = 0
        for i in range(num_quads):
            idx = i << 1
            left_quad = (a_bits[idx] << 1) + a_bits[idx + 1]
            right_quad = (b_bits[idx] << 1) + b_bits[idx + 1]
            out_quad = (left_quad ^ right_quad) if is_xor \
                else (left_quad & right_quad)
            prod_quad = left_quad * right_quad
            left_acc = (4 * left_acc + left_quad) % R
            right_acc = (4 * right_acc + right_quad) % R
            out_acc = (4 * out_acc + out_quad) % R
            var_a = self.add_input(left_acc)
            var_b = self.add_input(right_acc)
            var_c = self.add_input(prod_quad)
            var_4 = self.add_input(out_acc)
            self.variable_map[var_a].append((LEFT, self.n))
            self.variable_map[var_b].append((RIGHT, self.n))
            self.variable_map[var_4].append((FOURTH, self.n))
            self.variable_map[var_c].append((OUTPUT, self.n - 1))
            self.w_l.append(var_a)
            self.w_r.append(var_b)
            self.w_o.append(var_c)
            self.w_4.append(var_4)
            self.n += 1

        self.variable_map[self.zero_var].append((OUTPUT, self.n - 1))
        self.w_o.append(self.zero_var)

        for _ in range(num_quads):
            if is_xor:
                self._push_selectors(q_c=(-1) % R, q_logic=(-1) % R)
            else:
                self._push_selectors(q_c=1, q_logic=1)
        self._push_selectors()  # last no-op row

        return self.w_4[-1]

    def xor_gate(self, a, b, num_bits):
        return self._logic_gate(a, b, num_bits, True)

    def and_gate(self, a, b, num_bits):
        return self._logic_gate(a, b, num_bits, False)

    # ----------------------------------------------------------- lookup gate

    def lookup_gate(self, a, b, c, d=None, pi=None) -> int:
        """Row with only q_lookup=1 (lookup.rs:18-65)."""
        if d is None:
            d = self.zero_var
        self.w_l.append(a)
        self.w_r.append(b)
        self.w_o.append(c)
        self.w_4.append(d)
        self._push_selectors(q_lookup=1)
        if pi is not None:
            self.add_pi(self.n, pi)
        self._add_wires_to_map(a, b, c, d, self.n)
        self.n += 1
        return c

    # ------------------------------------------------------------ ECC gates

    def add_affine(self, p) -> Point:
        return Point(self.add_input(p[0]), self.add_input(p[1]))

    def add_public_affine(self, p) -> Point:
        point = self.add_affine(p)
        self.constrain_to_constant(point.x, 0, (-p[0]) % R)
        self.constrain_to_constant(point.y, 0, (-p[1]) % R)
        return point

    def add_affine_to_circuit_description(self, p) -> Point:
        return Point(self.add_witness_to_circuit_description(p[0]),
                     self.add_witness_to_circuit_description(p[1]))

    def point_identity(self) -> Point:
        one = self.add_witness_to_circuit_description(1)
        return Point(self.zero_var, one)

    def assert_equal_public_point(self, point: Point, public_point):
        self.constrain_to_constant(point.x, 0, (-public_point[0]) % R)
        self.constrain_to_constant(point.y, 0, (-public_point[1]) % R)

    def assert_equal_point(self, lhs: Point, rhs: Point):
        self.assert_equal(lhs.x, rhs.x)
        self.assert_equal(lhs.y, rhs.y)

    def conditional_point_select(self, point_1: Point, point_0: Point,
                                 bit) -> Point:
        return Point(self.conditional_select(bit, point_1.x, point_0.x),
                     self.conditional_select(bit, point_1.y, point_0.y))

    def conditional_point_neg(self, bit, point_b: Point) -> Point:
        x_neg = self.arithmetic_gate((point_b.x, self.zero_var, None),
                                     add=((-1) % R, 0))
        return Point(self.conditional_select(bit, x_neg, point_b.x), point_b.y)

    def conditional_select_identity(self, bit, point: Point) -> Point:
        return Point(self.conditional_select_zero(bit, point.x),
                     self.conditional_select_one(bit, point.y))

    def point_addition_gate(self, point_a: Point, point_b: Point) -> Point:
        """Two-row variable-base TE addition (variable_base_gate.rs:24-93)."""
        x1, y1, x2, y2 = point_a.x, point_a.y, point_b.x, point_b.y
        p1 = (self.variables[x1], self.variables[y1])
        p2 = (self.variables[x2], self.variables[y2])
        x3s, y3s = jubjub.add(p1, p2)
        x1y2 = p1[0] * p2[1] % R
        x_1_y_2 = self.add_input(x1y2)
        x3 = self.add_input(x3s)
        y3 = self.add_input(y3s)
        self.w_l.extend([x1, x3])
        self.w_r.extend([y1, y3])
        self.w_o.extend([x2, self.zero_var])
        self.w_4.extend([y2, x_1_y_2])
        self._push_selectors(q_variable_group_add=1)
        self._push_selectors()
        self._add_wires_to_map(x1, y1, x2, y2, self.n)
        self.n += 1
        self._add_wires_to_map(x3, y3, self.zero_var, x_1_y_2, self.n)
        self.n += 1
        return Point(x3, y3)

    def fixed_base_scalar_mul(self, scalar_var: int, base_point=None) -> Point:
        """WNAF2 fixed-base scalar mul gadget (ecc/scalar_mul/fixed_base.rs)."""
        if base_point is None:
            base_point = jubjub.GENERATOR
        num_bits = 255  # MODULUS_BITS of Fr

        # point_multiples[i] = 2^i * G, then reversed
        multiples = [base_point]
        for _ in range(1, num_bits):
            multiples.append(jubjub.add(multiples[-1], multiples[-1]))
        multiples.reverse()

        scalar_value = self.variables[scalar_var]
        wnaf_entries = jubjub.wnaf2(scalar_value)
        assert len(wnaf_entries) <= num_bits

        scalar_acc = [0]
        point_acc = [jubjub.IDENTITY]
        xy_alphas = []
        n_trailing_zeros = num_bits - len(wnaf_entries)
        scalar_acc.extend([0] * n_trailing_zeros)
        point_acc.extend([jubjub.IDENTITY] * n_trailing_zeros)
        xy_alphas.extend([0] * n_trailing_zeros)

        for i, entry in enumerate(reversed(wnaf_entries)):
            index = i + n_trailing_zeros
            if entry == 0:
                scalar_to_add, point_to_add = 0, jubjub.IDENTITY
            elif entry == -1:
                scalar_to_add, point_to_add = \
                    (-1) % R, jubjub.neg(multiples[index])
            else:
                scalar_to_add, point_to_add = 1, multiples[index]
            scalar_acc.append((2 * scalar_acc[index] + scalar_to_add) % R)
            point_acc.append(jubjub.add(point_acc[index], point_to_add))
            xy_alphas.append(point_to_add[0] * point_to_add[1] % R)

        for i in range(num_bits):
            acc_x = self.add_input(point_acc[i][0])
            acc_y = self.add_input(point_acc[i][1])
            accumulated_bit = self.add_input(scalar_acc[i])
            if i == 0:
                self.constrain_to_constant(acc_x, 0, None)
                self.constrain_to_constant(acc_y, 1, None)
                self.constrain_to_constant(accumulated_bit, 0, None)
            x_beta, y_beta = multiples[i]
            xy_alpha = self.add_input(xy_alphas[i])
            xy_beta = x_beta * y_beta % R
            # fixed_group_add row (fixed_base_gate.rs:77-107)
            self.w_l.append(acc_x)
            self.w_r.append(acc_y)
            self.w_o.append(xy_alpha)
            self.w_4.append(accumulated_bit)
            self._push_selectors(q_l=x_beta, q_r=y_beta, q_c=xy_beta,
                                 q_fixed_group_add=1)
            self._add_wires_to_map(acc_x, acc_y, xy_alpha, accumulated_bit,
                                   self.n)
            self.n += 1

        # last row: plain arithmetic gate, not activated for ECC
        acc_x = self.add_input(point_acc[num_bits][0])
        acc_y = self.add_input(point_acc[num_bits][1])
        xy_alpha = self.zero_var
        last_accumulated_bit = self.add_input(scalar_acc[num_bits])
        self.arithmetic_gate((acc_x, acc_y, xy_alpha),
                             fan_in_3=(0, last_accumulated_bit), out=0)
        self.assert_equal(last_accumulated_bit, scalar_var)
        return Point(acc_x, acc_y)

    def variable_base_scalar_mul(self, scalar_var: int, point: Point) -> Point:
        """Bit-decomposition double-and-add (ecc/scalar_mul/variable_base.rs)."""
        bits = self._scalar_decomposition(scalar_var)
        result = self.point_identity()
        for bit in reversed(bits):
            result = self.point_addition_gate(result, result)
            point_to_add = self.conditional_select_identity(bit, point)
            result = self.point_addition_gate(result, point_to_add)
        return result

    def _scalar_decomposition(self, witness_var: int) -> list[int]:
        scalar = self.variables[witness_var]
        bits_le = [(scalar >> i) & 1 for i in range(256)]
        bit_vars = [self.add_input(b) for b in bits_le][:255]
        accumulator_var = self.zero_var
        for power, bit in enumerate(bit_vars):
            self.boolean_gate(bit)
            two_pow = pow(2, power, R)
            accumulator_var = self.arithmetic_gate(
                (bit, accumulator_var, None), add=(two_pow, 1))
        self.assert_equal(accumulator_var, witness_var)
        return bit_vars

    # ------------------------------------------------- dummies and blinding

    def add_dummy_constraints(self):
        """Benchmark dummy gates (composer.rs:493-551)."""
        var_six = self.add_input(6)
        var_one = self.add_input(1)
        var_seven = self.add_input(7)
        var_min_twenty = self.add_input((-20) % R)
        self._push_selectors(q_m=1, q_l=2, q_r=3, q_o=4, q_c=4, q_4=1,
                             q_arith=1, q_lookup=1)
        self.w_l.append(var_six)
        self.w_r.append(var_seven)
        self.w_o.append(var_min_twenty)
        self.w_4.append(var_one)
        self._add_wires_to_map(var_six, var_seven, var_min_twenty, var_one,
                               self.n)
        self.n += 1
        self._push_selectors(q_m=1, q_l=1, q_r=1, q_o=1, q_c=127, q_arith=1,
                             q_lookup=1)
        self.w_l.append(var_min_twenty)
        self.w_r.append(var_six)
        self.w_o.append(var_seven)
        self.w_4.append(self.zero_var)
        self._add_wires_to_map(var_min_twenty, var_six, var_seven,
                               self.zero_var, self.n)
        self.n += 1

    def add_dummy_lookup_table(self):
        """(composer.rs:553-577)"""
        self.lookup_table.insert_row(6, 7, (-20) % R, 1)
        self.lookup_table.insert_row((-20) % R, 6, 7, 0)
        self.lookup_table.insert_row(3, 1, 4, 9)

    def add_blinding_factors(self):
        """2 random wire rows + 1 row of repeated randoms to blind z
        (composer.rs:580-648)."""
        rand_var_1 = rand_var_2 = self.zero_var
        for _ in range(2):
            rand_var_1 = self.add_input(self._rng())
            rand_var_2 = self.add_input(self._rng())
            rand_var_3 = self.add_input(self._rng())
            rand_var_4 = self.add_input(self._rng())
            self.w_l.append(rand_var_1)
            self.w_r.append(rand_var_2)
            self.w_o.append(rand_var_3)
            self.w_4.append(rand_var_4)
            self._push_selectors()
            self._add_wires_to_map(rand_var_1, rand_var_2, rand_var_3,
                                   rand_var_4, self.n)
            self.n += 1
        self.w_l.append(rand_var_1)
        self.w_r.append(rand_var_2)
        self.w_o.append(self.zero_var)
        self.w_4.append(self.zero_var)
        self._push_selectors()
        self._add_wires_to_map(rand_var_1, rand_var_2, self.zero_var,
                               self.zero_var, self.n)
        self.n += 1

    # ------------------------------------------------------------- padding

    def pad(self, diff: int):
        """Pad with zero-selector/zero-var rows (preprocess.rs:61-88)."""
        for s in SELECTOR_NAMES:
            getattr(self, s).extend([0] * diff)
        self.w_l.extend([self.zero_var] * diff)
        self.w_r.extend([self.zero_var] * diff)
        self.w_o.extend([self.zero_var] * diff)
        self.w_4.extend([self.zero_var] * diff)
        self.n += diff

    # ------------------------------------------------------------ debugging

    def check_circuit_satisfied(self, trace_print: bool = False):
        """Front-end row-wise identity evaluator (composer.rs:661-814,
        `trace` feature). Raises with the failing gate index.

        trace_print=True additionally dumps every gate's selector and
        witness values, mirroring the reference's `trace-print` cargo
        feature (composer.rs:714-751)."""
        wl = [self.variables[v] for v in self.w_l]
        wr = [self.variables[v] for v in self.w_r]
        wo = [self.variables[v] for v in self.w_o]
        w4 = [self.variables[v] for v in self.w_4]
        pi = self.public_inputs

        def four_delta(f):
            return f * (f - 1) * (f - 2) * (f - 3) % R

        for i in range(self.n):
            a, b, c, d = wl[i], wr[i], wo[i], w4[i]
            a_next = wl[i + 1] if i + 1 < self.n else 0
            b_next = wr[i + 1] if i + 1 < self.n else 0
            d_next = w4[i + 1] if i + 1 < self.n else 0
            qm, ql, qr, qo = self.q_m[i], self.q_l[i], self.q_r[i], self.q_o[i]
            q4, qc = self.q_4[i], self.q_c[i]
            qarith = self.q_arith[i]
            qrange, qlogic = self.q_range[i], self.q_logic[i]
            qfixed = self.q_fixed_group_add[i]
            qvar = self.q_variable_group_add[i]
            pival = pi.get(i, 0)

            if trace_print:
                print(f"--------------------------------------------\n"
                      f"#Gate Index = {i}\n"
                      f"#Selector Polynomials:\n"
                      f"- qm -> {qm}\n- ql -> {ql}\n- qr -> {qr}\n"
                      f"- q4 -> {q4}\n- qo -> {qo}\n- qc -> {qc}\n"
                      f"- q_arith -> {qarith}\n- q_range -> {qrange}\n"
                      f"- q_logic -> {qlogic}\n"
                      f"- q_fixed_group_add -> {qfixed}\n"
                      f"- q_variable_group_add -> {qvar}\n"
                      f"# Witness polynomials:\n"
                      f"- w_l -> {a}\n- w_r -> {b}\n- w_o -> {c}\n"
                      f"- w_4 -> {d}")

            arith = (qm * a * b + ql * a + qr * b + qo * c + q4 * d
                     + qc + pival) * qarith % R
            range_t = qrange * (
                four_delta(c - 4 * d) + four_delta(b - 4 * c)
                + four_delta(a - 4 * b) + four_delta(d_next - 4 * a)) % R
            logic_t = 0
            if qlogic % R != 0:
                # quads must be in [0,3]; evaluate the real bitwise op
                # (mirrors the trace evaluator, composer.rs:714-780)
                aqi = (a_next - 4 * a) % R
                bqi = (b_next - 4 * b) % R
                dqi = (d_next - 4 * d) % R
                if aqi >= 4 or bqi >= 4:
                    raise AssertionError(
                        f"gate {i}: logic input quad out of range")
                expected = (aqi & bqi) if qlogic == 1 else (aqi ^ bqi)
                if (dqi - expected) % R or (c - aqi * bqi) % R:
                    raise AssertionError(f"gate {i} logic unsatisfied")
            fixed_t = 0
            if qfixed % R != 0:
                x_beta, y_beta, xy_beta = ql, qr, qc
                acc_x, acc_y, xy_alpha, acc_bit = a, b, c, d
                bit = (d_next - 2 * acc_bit) % R
                bcheck = bit * (bit - 1) % R * (bit + 1) % R
                y_alpha = (bit * bit % R * (y_beta - 1) + 1) % R
                x_alpha = x_beta * bit % R
                xy_c = (bit * xy_beta - xy_alpha) % R
                x3, y3 = a_next, b_next
                xlhs = (x3 + x3 * xy_alpha % R * acc_x % R * acc_y % R
                        * jubjub.D) % R
                xrhs = (x_alpha * acc_y + y_alpha * acc_x) % R
                ylhs = (y3 - y3 * xy_alpha % R * acc_x % R * acc_y % R
                        * jubjub.D) % R
                yrhs = (y_alpha * acc_y - jubjub.A * x_alpha % R * acc_x) % R
                fixed_t = (bcheck + xy_c + (xlhs - xrhs) + (ylhs - yrhs)) % R
            var_t = 0
            if qvar % R != 0:
                x1, y1, x2, y2 = a, b, c, d
                x3, y3, x1y2 = a_next, b_next, d_next
                xy_c = (x1 * y2 - x1y2) % R
                y1x2 = y1 * x2 % R
                x3l = (x1y2 + y1x2) % R
                x3r = (x3 + x3 * jubjub.D % R * x1y2 % R * y1x2) % R
                y3l = (y1 * y2 - jubjub.A * x1 % R * x2) % R
                y3r = (y3 - y3 * jubjub.D % R * x1y2 % R * y1x2) % R
                var_t = (xy_c + (x3l - x3r) + (y3l - y3r)) % R
            if (arith + range_t + logic_t + fixed_t + var_t) % R != 0:
                raise AssertionError(
                    f"gate {i} unsatisfied: arith={arith} range={range_t} "
                    f"fixed={fixed_t} var={var_t}")
