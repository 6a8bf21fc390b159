"""Prover: the 5-round PLONK(+plookup) protocol (host golden path).

Mirrors /root/reference/plonk-core/src/proof_system/prover.rs:163-669.
Transcript labels and ordering are byte-exact (including the reference's
"seperation" typos on the appended challenge labels, prover.rs:403-425).

The numeric cores (NTTs, grand products, quotient, MSM commits) are factored
so the device (JAX) prover in proving/device.py swaps them 1:1 and is
cross-checked against this path.
"""

from __future__ import annotations

from ..fields import host
from ..fields.host import R
from ..poly import ntt
from ..pcs import kzg
from ..transcript.plonk import PlonkTranscript
from ..circuit.composer import StandardComposer
from ..circuit.lookup_table import MultiSet
from . import permutation as perm_mod
from . import preprocess as prep
from . import quotient as quotient_mod
from . import linearisation as lin_mod
from . import pi as pi_mod
from .proof import Proof


class Prover:
    """Holds a composer + prover key + preprocessed transcript
    (prover.rs:32-51)."""

    def __init__(self, label: bytes, rng=None, msm=None, pcs=None):
        self.cs = StandardComposer(rng=rng)
        self.prover_key = None
        self.verifier_key = None
        self.preprocessed_transcript = PlonkTranscript(label)
        self._rng = rng
        self.msm = msm
        self.pcs = pcs if pcs is not None else kzg

    def key_transcript(self, label: bytes, message: bytes):
        self.preprocessed_transcript.t.append_message(label, message)

    def circuit_bound(self) -> int:
        return self.cs.circuit_bound()

    def preprocess(self, srs):
        if self.prover_key is not None:
            raise ValueError("circuit already preprocessed")
        pk, vk = prep.preprocess_prover(
            self.cs, srs, self.preprocessed_transcript, msm=self.msm,
            pcs=self.pcs)
        self.prover_key = pk
        self.verifier_key = vk
        return pk

    def clear_witness(self):
        self.cs = StandardComposer(rng=self._rng)

    def prove(self, srs) -> Proof:
        if self.prover_key is None:
            self.preprocess(srs)
        proof = self.prove_with_preprocessed(srs, self.prover_key)
        self.clear_witness()
        return proof

    # ------------------------------------------------------------------

    def prove_with_preprocessed(self, srs, pk) -> Proof:
        cs = self.cs
        domain = host.Domain(cs.circuit_bound())
        n = domain.size
        transcript = self.preprocessed_transcript.clone()

        transcript.append_pi(b"pi", pi_mod.to_bytes(cs.public_inputs))

        def commit(poly):
            return self.pcs.commit(srs, poly, msm=self.msm)

        # --- Round 1: witness polynomials --------------------------------
        pad = [0] * (n - len(cs.w_l))
        w_l_scalar = [cs.variables[v] for v in cs.w_l] + pad
        w_r_scalar = [cs.variables[v] for v in cs.w_r] + pad
        w_o_scalar = [cs.variables[v] for v in cs.w_o] + pad
        w_4_scalar = [cs.variables[v] for v in cs.w_4] + pad

        w_l_poly = ntt.intt_host(w_l_scalar, domain)
        w_r_poly = ntt.intt_host(w_r_scalar, domain)
        w_o_poly = ntt.intt_host(w_o_scalar, domain)
        w_4_poly = ntt.intt_host(w_4_scalar, domain)

        a_comm = commit(w_l_poly)
        b_comm = commit(w_r_poly)
        c_comm = commit(w_o_poly)
        d_comm = commit(w_4_poly)
        transcript.append_g1(b"w_l", a_comm)
        transcript.append_g1(b"w_r", b_comm)
        transcript.append_g1(b"w_o", c_comm)
        transcript.append_g1(b"w_4", d_comm)

        # --- Round 2: plookup --------------------------------------------
        zeta = transcript.challenge_scalar(b"zeta")
        transcript.append_fr(b"zeta", zeta)

        t_cols = pk.table_columns
        compressed_t = MultiSet.compress(t_cols, zeta)
        table_poly = ntt.intt_host(compressed_t.elems, domain)

        q_lookup_padded = cs.q_lookup + [0] * (n - len(cs.q_lookup))
        f_scalars = [[], [], [], []]
        for i in range(n):
            if q_lookup_padded[i] % R == 0:
                f_scalars[0].append(compressed_t.elems[0])
                for k in (1, 2, 3):
                    f_scalars[k].append(0)
            else:
                f_scalars[0].append(w_l_scalar[i])
                f_scalars[1].append(w_r_scalar[i])
                f_scalars[2].append(w_o_scalar[i])
                f_scalars[3].append(w_4_scalar[i])
        compressed_f = MultiSet.compress(
            [MultiSet(col) for col in f_scalars], zeta)
        f_poly = ntt.intt_host(compressed_f.elems, domain)
        f_comm = commit(f_poly)
        transcript.append_g1(b"f", f_comm)

        h_1, h_2 = compressed_t.combine_split(compressed_f)
        h_1_poly = ntt.intt_host(h_1.elems, domain)
        h_2_poly = ntt.intt_host(h_2.elems, domain)
        h_1_comm = commit(h_1_poly)
        h_2_comm = commit(h_2_poly)
        transcript.append_g1(b"h1", h_1_comm)
        transcript.append_g1(b"h2", h_2_comm)

        # --- Round 3: grand products -------------------------------------
        beta = transcript.challenge_scalar(b"beta")
        transcript.append_fr(b"beta", beta)
        gamma = transcript.challenge_scalar(b"gamma")
        transcript.append_fr(b"gamma", gamma)
        delta = transcript.challenge_scalar(b"delta")
        transcript.append_fr(b"delta", delta)
        epsilon = transcript.challenge_scalar(b"epsilon")
        transcript.append_fr(b"epsilon", epsilon)
        assert len({beta, gamma, delta, epsilon}) == 4, \
            "challenges must be different"

        z_poly = perm_mod.compute_permutation_poly(
            domain, (w_l_scalar, w_r_scalar, w_o_scalar, w_4_scalar),
            beta, gamma,
            (pk.sigmas["left_sigma"], pk.sigmas["right_sigma"],
             pk.sigmas["out_sigma"], pk.sigmas["fourth_sigma"]))
        z_comm = commit(z_poly)
        transcript.append_g1(b"z", z_comm)

        z_2_poly = perm_mod.compute_lookup_permutation_poly(
            domain, compressed_f.elems, compressed_t.elems, h_1.elems,
            h_2.elems, delta, epsilon)
        z_2_comm = commit(z_2_poly)
        # NOTE: the reference does NOT append z_2_comm here (prover.rs:383-389)

        pi_poly = pi_mod.into_dense_poly(cs.public_inputs, n)

        # --- Round 4: quotient -------------------------------------------
        alpha = transcript.challenge_scalar(b"alpha")
        transcript.append_fr(b"alpha", alpha)
        range_ch = transcript.challenge_scalar(b"range separation challenge")
        transcript.append_fr(b"range seperation challenge", range_ch)
        logic_ch = transcript.challenge_scalar(b"logic separation challenge")
        transcript.append_fr(b"logic seperation challenge", logic_ch)
        fixed_ch = transcript.challenge_scalar(
            b"fixed base separation challenge")
        transcript.append_fr(b"fixed base separation challenge", fixed_ch)
        var_ch = transcript.challenge_scalar(
            b"variable base separation challenge")
        transcript.append_fr(b"variable base separation challenge", var_ch)
        lookup_ch = transcript.challenge_scalar(
            b"lookup separation challenge")
        transcript.append_fr(b"lookup separation challenge", lookup_ch)

        t_poly = quotient_mod.compute(
            domain, pk, z_poly, z_2_poly, w_l_poly, w_r_poly, w_o_poly,
            w_4_poly, pi_poly, f_poly, table_poly, h_1_poly, h_2_poly,
            alpha, beta, gamma, delta, epsilon, zeta,
            range_ch, logic_ch, fixed_ch, var_ch, lookup_ch)

        def split(t, k):
            part = t[k * n:(k + 1) * n] if k < 3 else t[3 * n:]
            return list(part)

        t_1_poly, t_2_poly, t_3_poly, t_4_poly = (split(t_poly, k)
                                                  for k in range(4))
        t_1_comm = commit(t_1_poly)
        t_2_comm = commit(t_2_poly)
        t_3_comm = commit(t_3_poly)
        t_4_comm = commit(t_4_poly)
        transcript.append_g1(b"t_1", t_1_comm)
        transcript.append_g1(b"t_2", t_2_comm)
        transcript.append_g1(b"t_3", t_3_comm)
        transcript.append_g1(b"t_4", t_4_comm)

        # --- Round 5: evaluations + openings -----------------------------
        z_challenge = transcript.challenge_scalar(b"z")
        transcript.append_fr(b"z", z_challenge)

        lin_poly, evals = lin_mod.compute(
            domain, pk, alpha, beta, gamma, delta, epsilon, zeta,
            range_ch, logic_ch, fixed_ch, var_ch, lookup_ch, z_challenge,
            w_l_poly, w_r_poly, w_o_poly, w_4_poly,
            t_1_poly, t_2_poly, t_3_poly, t_4_poly,
            z_poly, z_2_poly, f_poly, h_1_poly, h_2_poly, table_poly)

        transcript.append_fr(b"a_eval", evals.a_eval)
        transcript.append_fr(b"b_eval", evals.b_eval)
        transcript.append_fr(b"c_eval", evals.c_eval)
        transcript.append_fr(b"d_eval", evals.d_eval)
        transcript.append_fr(b"left_sig_eval", evals.left_sigma_eval)
        transcript.append_fr(b"right_sig_eval", evals.right_sigma_eval)
        transcript.append_fr(b"out_sig_eval", evals.out_sigma_eval)
        transcript.append_fr(b"perm_eval", evals.permutation_eval)
        transcript.append_fr(b"f_eval", evals.f_eval)
        transcript.append_fr(b"q_lookup_eval", evals.q_lookup_eval)
        transcript.append_fr(b"lookup_perm_eval", evals.z2_next_eval)
        transcript.append_fr(b"h_1_eval", evals.h1_eval)
        transcript.append_fr(b"h_1_next_eval", evals.h1_next_eval)
        transcript.append_fr(b"h_2_eval", evals.h2_eval)
        for label, val in evals.custom_evals:
            transcript.append_fr(label.encode(), val)

        aw_challenge = transcript.challenge_scalar(b"aggregate_witness")
        aw_polys = [lin_poly, pk.sigmas["left_sigma"],
                    pk.sigmas["right_sigma"], pk.sigmas["out_sigma"],
                    f_poly, h_2_poly, table_poly,
                    w_l_poly, w_r_poly, w_o_poly, w_4_poly]
        aw_opening = self.pcs.open_polys(srs, aw_polys, z_challenge,
                                         aw_challenge, msm=self.msm)

        saw_challenge = transcript.challenge_scalar(b"aggregate_witness")
        saw_polys = [z_poly, w_l_poly, w_r_poly, w_4_poly, h_1_poly,
                     z_2_poly, table_poly]
        saw_opening = self.pcs.open_polys(
            srs, saw_polys, z_challenge * domain.group_gen % R,
            saw_challenge, msm=self.msm)

        return Proof(
            a_comm=a_comm, b_comm=b_comm, c_comm=c_comm, d_comm=d_comm,
            z_comm=z_comm, f_comm=f_comm, h_1_comm=h_1_comm,
            h_2_comm=h_2_comm, z_2_comm=z_2_comm,
            t_1_comm=t_1_comm, t_2_comm=t_2_comm, t_3_comm=t_3_comm,
            t_4_comm=t_4_comm,
            aw_opening=aw_opening, saw_opening=saw_opening,
            evaluations=evals)
