"""Port of the reference `examples/example_poly.rs` (behavioral parity).

Circuit for the branching function
    f(x, y, z) = y*z      if x == 1
               = 2y - z   otherwise
via is_zero + xor gates.
"""

import sys

sys.path.insert(0, ".")

from arkplonk_tpu.api.circuit import Circuit, verify_proof
from arkplonk_tpu.fields.host import R
from arkplonk_tpu.pcs import kzg


class PolyCircuit(Circuit):
    def __init__(self, x=0, y=0, z=0, r=0):
        self.x, self.y, self.z, self.r = x, y, z, r

    def gadget(self, cs):
        x = cs.add_input(self.x)
        y = cs.add_input(self.y)
        z = cs.add_input(self.z)
        r = cs.add_input(self.r)
        one = cs.add_input(1)
        zero = cs.zero_var

        two_y_minus_z = cs.arithmetic_gate((y, z, None), add=(2, (-1) % R))
        y_times_z = cs.arithmetic_gate((y, z, None), mul=1)
        x_minus_1 = cs.arithmetic_gate((x, zero, None), add=(1, 0),
                                       constant=(-1) % R)
        x_bool = cs.is_zero_with_output(x_minus_1)
        x_bool_negate = cs.xor_gate(x_bool, one, 10)
        part_1 = cs.arithmetic_gate((x_bool, y_times_z, None), mul=1)
        part_2 = cs.arithmetic_gate((x_bool_negate, two_y_minus_z, None),
                                    mul=1)
        f_out = cs.arithmetic_gate((part_1, part_2, None), add=(1, 1))
        cs.assert_equal(f_out, r)

    def padded_circuit_size(self):
        return 1 << 7


def main():
    srs = kzg.SRS.setup(1 << 8)
    circuit = PolyCircuit()
    pk, vk, _ = circuit.compile(srs)

    # x == 1 branch: f(1, 5, 7) = 35
    inst = PolyCircuit(x=1, y=5, z=7, r=35)
    proof, pi = inst.gen_proof(srs, pk, b"Test")
    assert verify_proof(srs, vk, proof, pi, b"Test")
    print("branch x==1: f(1,5,7)=35 proof OK")

    # x != 1 branch: f(3, 5, 7) = 2*5-7 = 3
    inst = PolyCircuit(x=3, y=5, z=7, r=3)
    proof, pi = inst.gen_proof(srs, pk, b"Test")
    assert verify_proof(srs, vk, proof, pi, b"Test")
    print("branch x!=1: f(3,5,7)=3 proof OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
