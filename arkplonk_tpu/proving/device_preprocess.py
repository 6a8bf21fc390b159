"""Device (TPU) circuit preprocessing.

Round 1 ran preprocessing entirely in host Python (~32 size-n/4n bigint
NTTs: 52.6 s at 2^12 vs the reference's 315 ms compile,
preprocess.rs:126-243).  This module runs the numeric pipeline on
device, batched:

  - ONE batched iNTT interpolates all 20 columns (12 selectors + 4
    lookup-table columns + 4 sigma Lagrange columns) at once;
  - sigma Lagrange encodings (permutation/mod.rs:139-169: roots x
    {1,K1,K2,K3}) are built on device from the (kind, index) wire maps
    by gathers — no host bigint loop;
  - ONE batched coset-NTT produces all 16 4n-domain selector/sigma
    stacks;
  - the 20 commitments run through the device Pippenger in P=4 groups
    (sharing the prove path's compiled executable), in the reference
    commit order (preprocess.rs:355-374).

The host path (preprocess.py) remains the golden model; the device path
is cross-checked against it in tests/test_device_preprocess.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import host
from ..fields.host import R
from ..fields.jaxfield import FR, U32
from ..fields.limb import encode_ints
from ..poly import ntt
from ..circuit.composer import SELECTOR_NAMES, K1, K2, K3
from . import permutation as perm_mod
from .keys import VerifierKey, SIGMA_ORDER


@functools.lru_cache(maxsize=None)
def _prep_fn(n: int):
    @jax.jit
    def f(dd, dd4, evals16, kind, idx):
        """evals16: (L, 16, n) = 12 selectors + 4 table columns (evals);
        kind/idx: (4, n) int32 sigma wire maps; dd/dd4: runtime NTT
        domain tables (argument, not constant — see ntt.DeviceDomain).
        Returns (coeffs (L,20,n), evals4 (L,16,4n), sig_lag (L,4,n))."""
        kvals = jnp.asarray(encode_ints(
            [k * FR.R_mod % R for k in (1, K1, K2, K3)], FR.L))  # (L, 4)
        kg = kvals[:, kind]                       # (L, 4, n)
        roots_g = dd.roots[:, idx]                # (L, 4, n)
        sig_lag = FR.mont_mul(kg, roots_g)

        all_evals = jnp.concatenate([evals16, sig_lag], axis=1)  # (L,20,n)
        coeffs = ntt.intt(all_evals, dd)
        sel_coeffs = coeffs[:, :12]
        sig_coeffs = coeffs[:, 16:20]
        sixteen = jnp.concatenate([sel_coeffs, sig_coeffs], axis=1)
        padded = jnp.concatenate(
            [sixteen, jnp.zeros((FR.L, 16, 3 * n), U32)], axis=-1)
        evals4 = ntt.coset_ntt(padded, dd4)
        return coeffs, evals4, sig_lag

    return f


def device_preprocess(cs, srs, transcript, msm):
    """Full device preprocess of a (filled) composer.

    Mutates `cs` exactly like the host preprocess_shared (table build +
    pad); appends the same transcript seed bytes.  Returns
    (DeviceProverKey, VerifierKey)."""
    from .device import DeviceProverKey, enc_stack_narrow
    from ..pcs import kzg
    import os as _os
    import time as _time

    _t = {"t0": _time.time()}

    def _mark(label):
        # host-side phase timing (ARKPLONK_PREP_TIMING=1); never touches
        # traced code, so enabling it cannot invalidate compile caches
        if _os.environ.get("ARKPLONK_PREP_TIMING") == "1":
            now = _time.time()
            print(f"[prep] {label}: +{now - _t['t0']:.2f}s", flush=True)
            _t["t0"] = now

    n = cs.circuit_bound()
    host.Domain(n)  # two-adicity guard (raises InvalidEvalDomainSize)

    columns = cs.lookup_table.vec_to_multiset()
    for col in columns:
        col.pad(n)
    cs.pad(n - cs.n)

    _mark("pad+table")
    sel_lists = [getattr(cs, name) for name in SELECTOR_NAMES]
    table_lists = [col.elems for col in columns]
    evals16 = enc_stack_narrow([[x % R for x in lst]
                                for lst in sel_lists + table_lists])

    _mark("enc_stack_narrow")
    sigmas = perm_mod.compute_sigma_permutations(cs.variable_map, n)
    kind = np.array([[k for (k, _) in s] for s in sigmas], np.int32)
    idx = np.array([[i for (_, i) in s] for s in sigmas], np.int32)

    _mark("sigma_cycles")
    ddn = ntt.get_device_domain(n)
    dd4n = ntt.get_device_domain(4 * n)
    _mark("device_domains")
    coeffs, evals4, sig_lag = _prep_fn(n)(
        ddn, dd4n, evals16, jnp.asarray(kind), jnp.asarray(idx))
    _mark("prep_fn dispatch")

    # commits in reference order (preprocess.rs:355-374): 12 selectors in
    # commit order (differs from the composer's SELECTOR_NAMES order),
    # then 4 sigmas, then the 4 table columns
    commit_order = ["q_m", "q_l", "q_r", "q_o", "q_4", "q_c", "q_arith",
                    "q_range", "q_logic", "q_lookup", "q_fixed_group_add",
                    "q_variable_group_add"]
    sel_perm = [SELECTOR_NAMES.index(nm) for nm in commit_order]
    commit_stack = jnp.concatenate(
        [coeffs[:, sel_perm], coeffs[:, 16:20], coeffs[:, 12:16]], axis=1)
    points = []
    if msm is not None:
        for k in range(0, 20, 4):
            points.extend(msm.commit_mont_batch(commit_stack[:, k:k + 4]))
            _mark(f"commit_batch {k // 4}")
    else:
        from .device import _dec_stack
        for k in range(20):
            points.append(kzg.commit(srs, _dec_stack(commit_stack[:, k])))

    names = (commit_order + list(SIGMA_ORDER)
             + [f"table_{i}" for i in range(1, 5)])
    commitments = dict(zip(names, points))

    vk = VerifierKey(n=cs.n, commitments=commitments)
    vk.seed_transcript(transcript)
    _mark("vk seed")

    dpk = DeviceProverKey.from_device_arrays(
        n=n,
        sel_coeffs=coeffs[:, :12],
        sel4=evals4[:, :12],
        sig_coeffs=coeffs[:, 16:20],
        sig4=evals4[:, 12:16],
        sigma_lagrange=sig_lag,
        table_cols=evals16[:, 12:16],
        msm=msm,
    )
    return dpk, vk
