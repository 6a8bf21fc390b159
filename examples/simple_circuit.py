"""Port of the reference `examples/simple_circuit.rs` (behavioral parity).

Circuit checks:
  1) a + b = c   (c public input)
  2) a <= 2^6, b <= 2^4 (range gates)
  3) a * b = d   (d public input)
  4) JubJub GENERATOR * e = f (f as public point)

Run: python examples/simple_circuit.py [--device]
"""

import sys
import time

sys.path.insert(0, ".")

from arkplonk_tpu.api.circuit import Circuit, verify_proof
from arkplonk_tpu.circuit import jubjub
from arkplonk_tpu.fields.host import R
from arkplonk_tpu.pcs import kzg


class SimpleCircuit(Circuit):
    def __init__(self, a=0, b=0, c=0, d=0, e=0, f=jubjub.IDENTITY):
        self.a, self.b, self.c, self.d, self.e, self.f = a, b, c, d, e, f

    def gadget(self, cs):
        a = cs.add_input(self.a)
        b = cs.add_input(self.b)
        zero = cs.zero_var
        # a + b = c (as PI)
        cs.arithmetic_gate((a, b, zero), add=(1, 1), pi=(-self.c) % R)
        # ranges
        cs.range_gate(a, 6)
        cs.range_gate(b, 4)
        # a * b = d (as PI)
        cs.arithmetic_gate((a, b, zero), mul=1, pi=(-self.d) % R)
        # fixed-base scalar mul by the JubJub generator
        e = cs.add_input(self.e)  # embedded scalar, already < r
        result = cs.fixed_base_scalar_mul(e)
        cs.assert_equal_public_point(result, self.f)

    def padded_circuit_size(self):
        return 1 << 9


def main():
    t0 = time.time()
    srs = kzg.SRS.setup(1 << 10)
    print(f"SRS setup: {time.time()-t0:.2f}s")

    circuit = SimpleCircuit()
    t0 = time.time()
    pk, vk, _pi_pos = circuit.compile(srs)
    print(f"compile: {time.time()-t0:.2f}s")

    point_f = jubjub.mul(jubjub.GENERATOR, 2)
    instance = SimpleCircuit(a=20, b=5, c=25, d=100, e=2, f=point_f)
    t0 = time.time()
    proof, pi = instance.gen_proof(srs, pk, b"Test")
    print(f"prove: {time.time()-t0:.2f}s")

    t0 = time.time()
    ok = verify_proof(srs, vk, proof, pi, b"Test")
    print(f"verify: {time.time()-t0:.2f}s -> {'OK' if ok else 'FAILED'}")
    assert ok
    return 0


if __name__ == "__main__":
    sys.exit(main())
