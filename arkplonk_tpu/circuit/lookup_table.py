"""Plookup tables and multisets (host).

Re-implements the behavior of the reference's lookup module:
- `LookupTable` arity-4 rows with add/mul/xor/and builders
  (plonk-core/src/lookup/lookup_table.rs:40-204)
- `MultiSet` pad / compress (RLC by zeta powers) / combine_split
  (plonk-core/src/lookup/multiset.rs:70-213)
"""

from __future__ import annotations

from ..fields.host import R


def lc(values, challenge: int) -> "int | list":
    """Horner linear combination v_0 + ch*v_1 + ... (reference util.rs:152)."""
    assert challenge % R not in (0, 1)
    acc = values[-1]
    if isinstance(acc, list):
        acc = list(acc)
        for col in reversed(values[:-1]):
            acc = [(a * challenge + v) % R for a, v in zip(acc, col)]
        return acc
    for v in reversed(values[:-1]):
        acc = (acc * challenge + v) % R
    return acc


class MultiSet:
    def __init__(self, elems=None):
        self.elems: list[int] = list(elems) if elems is not None else []

    def pad(self, n: int):
        assert n & (n - 1) == 0
        if not self.elems:
            self.elems.append(0)
        if n > len(self.elems):
            self.elems.extend([self.elems[0]] * (n - len(self.elems)))

    def __len__(self):
        return len(self.elems)

    @staticmethod
    def compress(multisets: list["MultiSet"], zeta: int) -> "MultiSet":
        length = len(multisets[0])
        for m in multisets[1:]:
            assert len(m) == length
        return MultiSet(lc([m.elems for m in multisets], zeta))

    def combine_split(self, f: "MultiSet"):
        """Order-preserving bucket 'sorted concatenation' of t (=self) and f,
        split into even/odd halves h1/h2 (multiset.rs:131-174).

        Bucket order follows first-appearance order in t (IndexMap semantics
        == Python dict semantics)."""
        counters: dict[int, int] = {}
        for e in self.elems:
            counters[e] = counters.get(e, 0) + 1
        for e in f.elems:
            if e not in counters:
                from ..errors import ElementNotIndexed
                raise ElementNotIndexed(
                    "lookup query element not in table")
            counters[e] += 1
        evens: list[int] = []
        odds: list[int] = []
        parity = 0
        for elem, count in counters.items():
            half = count // 2
            evens.extend([elem] * half)
            odds.extend([elem] * half)
            if count % 2 == 1:
                if parity == 1:
                    odds.append(elem)
                    parity = 0
                else:
                    evens.append(elem)
                    parity = 1
        return MultiSet(evens), MultiSet(odds)


class LookupTable:
    """Arity-4 lookup table rows."""

    def __init__(self):
        self.rows: list[list[int]] = []

    def size(self) -> int:
        return len(self.rows)

    def insert_row(self, a: int, b: int, c: int, d: int):
        self.rows.append([a % R, b % R, c % R, d % R])

    def insert_add_row(self, a: int, b: int, upper_bound: int):
        self.insert_row(a, b, (a + b) % upper_bound, 0)

    def insert_mul_row(self, a: int, b: int, upper_bound: int):
        self.insert_row(a, b, (a * b) % upper_bound, 1)

    def insert_xor_row(self, a: int, b: int, upper_bound: int):
        self.insert_row(a, b, (a ^ b) % upper_bound, R - 1)

    def insert_and_row(self, a: int, b: int, upper_bound: int):
        self.insert_row(a, b, (a & b) % upper_bound, 2)

    def _multi(self, fn, lower_bound: int, n: int):
        upper = 1 << n
        for a in range(lower_bound, upper):
            for b in range(lower_bound, upper):
                fn(a, b, upper)

    @classmethod
    def add_table(cls, lower_bound: int, n: int) -> "LookupTable":
        t = cls()
        t._multi(t.insert_add_row, lower_bound, n)
        return t

    @classmethod
    def xor_table(cls, lower_bound: int, n: int) -> "LookupTable":
        t = cls()
        t._multi(t.insert_xor_row, lower_bound, n)
        return t

    @classmethod
    def mul_table(cls, lower_bound: int, n: int) -> "LookupTable":
        t = cls()
        t._multi(t.insert_mul_row, lower_bound, n)
        return t

    @classmethod
    def and_table(cls, lower_bound: int, n: int) -> "LookupTable":
        t = cls()
        t._multi(t.insert_and_row, lower_bound, n)
        return t

    def lookup(self, a: int, b: int, d: int) -> int:
        """Find c for (a, b, ?, d) (lookup_table.rs:172)."""
        for row in self.rows:
            if row[0] == a % R and row[1] == b % R and row[3] == d % R:
                return row[2]
        from ..errors import ElementNotIndexed
        raise ElementNotIndexed((a, b, d))

    def vec_to_multiset(self):
        cols = [MultiSet() for _ in range(4)]
        for row in self.rows:
            for i in range(4):
                cols[i].elems.append(row[i])
        return cols
