"""Circuit preprocessing: selector/sigma interpolation + commitments.

Mirrors /root/reference/plonk-core/src/proof_system/preprocess.rs:
- preprocess_shared (:267-423): table preprocess, pad, iFFT 12 selectors,
  sigma polys, commit 16 polys in order, seed transcript
- preprocess_prover (:126-243): additionally coset-FFT everything to 4n,
  linear evals, vanishing poly over coset
"""

from __future__ import annotations

from ..fields import host
from ..fields.host import R, batch_inv
from ..fields.host import C as _C
FR_GENERATOR = _C.FR_GENERATOR
from ..poly import ntt
from ..pcs import kzg
from . import permutation as perm_mod
from .keys import ProverKey, VerifierKey, SELECTOR_ORDER, SIGMA_ORDER


def preprocess_lookup_table(table, srs, n: int, msm=None, pcs=None):
    """lookup/preprocess.rs:42-69: pad each column to n, iFFT, commit."""
    pcs = pcs if pcs is not None else kzg
    columns = table.vec_to_multiset()
    out_cols = []
    out_polys = []
    out_comms = []
    for col in columns:
        col.pad(n)
        poly = ntt.intt_host(col.elems, host.Domain(n))
        out_cols.append(col)
        out_polys.append(poly)
        out_comms.append(pcs.commit(srs, poly, msm=msm))
    return out_cols, out_polys, out_comms


def compute_vanishing_poly_over_coset(domain_4n: host.Domain, n: int):
    """preprocess.rs:429-452: v_H(x) = (g*w^i)^n - 1 over the 4n coset."""
    g_pow_n = pow(FR_GENERATOR, n, R)
    w = domain_4n.group_gen
    w_pow_n = pow(w, n, R)
    out = []
    acc = g_pow_n
    for _ in range(domain_4n.size):
        out.append((acc - 1) % R)
        acc = acc * w_pow_n % R
    return out


def preprocess_shared(cs, srs, transcript, msm=None, pcs=None):
    pcs = pcs if pcs is not None else kzg
    n_padded = cs.circuit_bound()
    domain = host.Domain(n_padded)

    table_cols, table_polys, table_comms = preprocess_lookup_table(
        cs.lookup_table, srs, n_padded, msm=msm, pcs=pcs)

    cs.pad(domain.size - cs.n)

    selectors = {}
    for name in SELECTOR_ORDER:
        selectors[name] = ntt.intt_host(getattr(cs, name), domain)

    sigma_polys, sigma_lagranges = perm_mod.compute_sigma_polynomials(
        cs.variable_map, cs.n, domain)
    sigmas = dict(zip(SIGMA_ORDER, sigma_polys))

    # Commit in the preprocess_shared order (preprocess.rs:355-374)
    commit_order = ["q_m", "q_l", "q_r", "q_o", "q_4", "q_c", "q_arith",
                    "q_range", "q_logic", "q_lookup", "q_fixed_group_add",
                    "q_variable_group_add"]
    commitments = {}
    for name in commit_order:
        commitments[name] = pcs.commit(srs, selectors[name], msm=msm)
    for name in SIGMA_ORDER:
        commitments[name] = pcs.commit(srs, sigmas[name], msm=msm)
    for i, c in enumerate(table_comms):
        commitments[f"table_{i+1}"] = c

    vk = VerifierKey(n=cs.n, commitments=commitments)
    vk.seed_transcript(transcript)
    return vk, selectors, sigmas, sigma_lagranges, domain, \
        (table_cols, table_polys)


def preprocess_prover(cs, srs, transcript, msm=None, pcs=None) -> ProverKey:
    vk, selectors, sigmas, sigma_lagranges, domain, table = \
        preprocess_shared(cs, srs, transcript, msm=msm, pcs=pcs)
    table_cols, _table_polys = table
    n = domain.size
    domain_4n = host.Domain(4 * n)

    selectors_4n = {name: ntt.coset_ntt_host(poly, domain_4n)
                    for name, poly in selectors.items()}
    sigmas_4n = {name: ntt.coset_ntt_host(poly, domain_4n)
                 for name, poly in sigmas.items()}
    linear_evaluations_4n = ntt.coset_ntt_host([0, 1], domain_4n)
    v_h = compute_vanishing_poly_over_coset(domain_4n, n)
    v_h_inv = batch_inv(v_h)

    return ProverKey(
        n=n,
        selectors=selectors,
        selectors_4n=selectors_4n,
        sigmas=sigmas,
        sigmas_4n=sigmas_4n,
        linear_evaluations_4n=linear_evaluations_4n,
        v_h_coset_4n=v_h,
        v_h_coset_4n_inv=v_h_inv,
        table_columns=table_cols,
        sigma_lagranges=sigma_lagranges,
    ), vk


def preprocess_verifier(cs, srs, transcript, msm=None, pcs=None
                        ) -> VerifierKey:
    vk, *_ = preprocess_shared(cs, srs, transcript, msm=msm, pcs=pcs)
    return vk
