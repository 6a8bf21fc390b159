"""Radix-2 NTT / iNTT / coset-NTT over Fr limb arrays.

TPU-native replacement for `ark-poly`'s `GeneralEvaluationDomain`
fft/ifft/coset_fft (consumed by the reference at e.g.
plonk-core/src/proof_system/preprocess.rs:303-341 and
quotient_poly.rs:71-120).

Design: the array keeps the fixed shape (L, n); each of the log2(n) stages is
one vectorized butterfly (gather partner + one mont_mul) inside a
`lax.fori_loop`, so the traced graph holds a single butterfly body regardless
of n.  Twiddles come from one full (L, n/2) root table indexed per stage.

Host-side exact NTT (Python ints) lives here too for golden checks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import host
from ..fields.jaxfield import FR
from ..fields.limb import vec_to_limbs

U32 = jnp.uint32


# --- host reference ---------------------------------------------------------

def ntt_host(coeffs, domain: host.Domain):
    """Evaluate polynomial (coefficient list, len<=n) on the domain. O(n log n)."""
    n = domain.size
    a = list(coeffs) + [0] * (n - len(coeffs))
    return _ntt_host_core(a, domain.group_gen)


def intt_host(evals, domain: host.Domain):
    a = _ntt_host_core(list(evals), domain.group_gen_inv)
    return [x * domain.size_inv % host.R for x in a]


def coset_ntt_host(coeffs, domain: host.Domain, g=None):
    g = domain.coset_gen if g is None else g
    n = domain.size
    a = list(coeffs) + [0] * (n - len(coeffs))
    gp = 1
    for i in range(n):
        a[i] = a[i] * gp % host.R
        gp = gp * g % host.R
    return _ntt_host_core(a, domain.group_gen)


def coset_intt_host(evals, domain: host.Domain, g=None):
    g = domain.coset_gen if g is None else g
    a = intt_host(evals, domain)
    ginv = host.fr_inv(g)
    gp = 1
    for i in range(len(a)):
        a[i] = a[i] * gp % host.R
        gp = gp * ginv % host.R
    return a


def _ntt_host_core(a, w_n):
    n = len(a)
    r = host.R
    if n == 1:
        return a
    k = n.bit_length() - 1
    a = [a[_bitrev(i, k)] for i in range(n)]
    m = 2
    while m <= n:
        wm = pow(w_n, n // m, r)
        for start in range(0, n, m):
            w = 1
            for j in range(m // 2):
                u = a[start + j]
                t = a[start + j + m // 2] * w % r
                a[start + j] = (u + t) % r
                a[start + j + m // 2] = (u - t) % r
                w = w * wm % r
        m <<= 1
    return a


def _bitrev(i, k):
    return int(bin(i)[2:].zfill(k)[::-1], 2)


# --- device tables ----------------------------------------------------------

class DeviceDomain:
    """Per-size precomputed tables for device NTTs (Montgomery form).

    Registered as a jax pytree and passed to jitted stage programs as a
    runtime ARGUMENT: a closed-over table becomes an HLO literal (hex
    text in the module, re-serialized into every executable) — at
    4n = 2^20 that is >300 MB of constants per program, which dominated
    tunnel-served compile time and the persistent-cache entry size."""

    def __init__(self, n: int):
        self.host = host.Domain(n)
        self.n = n
        self.k = self.host.log_size
        r = host.R
        w = self.host.group_gen
        wi = self.host.group_gen_inv

        def powers(base, count):
            out = [1] * count
            for j in range(1, count):
                out[j] = out[j - 1] * base % r
            return out

        def enc(xs):
            from ..fields.limb import encode_ints
            return jnp.asarray(
                encode_ints([x * FR.R_mod % r for x in xs], FR.L))

        # full root tables W[j] = w^j (doubles as the `linear_evaluations`
        # domain-elements table) and inverse
        self.roots = enc(powers(w, n))
        self.roots_inv = enc(powers(wi, n))
        self.tw = self.roots[:, :max(n // 2, 1)]
        self.tw_inv = self.roots_inv[:, :max(n // 2, 1)]
        self.bitrev = jnp.asarray(
            np.array([_bitrev(i, self.k) for i in range(n)], dtype=np.int32))
        self.n_inv = jnp.asarray(FR.encode(self.host.size_inv))
        # coset scaling vectors g^i and g^-i (Montgomery form)
        self.coset_pow = enc(powers(self.host.coset_gen, n))
        self.coset_pow_inv = enc(powers(self.host.coset_gen_inv, n))

    _LEAVES = ("roots", "roots_inv", "tw", "tw_inv", "bitrev", "n_inv",
               "coset_pow", "coset_pow_inv")

    def tree_flatten(self):
        return tuple(getattr(self, a) for a in self._LEAVES), (self.n, self.k)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.n, obj.k = aux
        obj.host = None  # host-side Domain not needed under trace
        for a, v in zip(cls._LEAVES, children):
            setattr(obj, a, v)
        return obj


jax.tree_util.register_pytree_node(
    DeviceDomain,
    DeviceDomain.tree_flatten,
    DeviceDomain.tree_unflatten)


@functools.lru_cache(maxsize=None)
def get_device_domain(n: int) -> DeviceDomain:
    return DeviceDomain(n)


# --- device NTT -------------------------------------------------------------

def _shspec(ndim, mesh_axes):
    """NamedSharding for an (L, ..., n) array: last axis over the mesh."""
    if mesh_axes is None:
        return None
    mesh, axis = mesh_axes
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(*([None] * (ndim - 1) + [axis])))


def _gather_last(x, idx, mesh_axes):
    """x[..., idx] with explicit out_sharding when running sharded
    (cross-shard gathers are otherwise ambiguous to the partitioner)."""
    if mesh_axes is None:
        return x[..., idx]
    return x.at[..., idx].get(out_sharding=_shspec(x.ndim, mesh_axes))


def _ntt_core(x, tw, k: int, mesh_axes=None):
    """Radix-2 DIT NTT on bit-reversed input x: (L, ..., n).

    Any batch dims between the limb axis and the element axis are allowed;
    all batch polys share the same butterfly/twiddle schedule.
    `mesh_axes=(mesh, axis_name)` enables sharded execution: the butterfly
    partner/twiddle gathers get explicit output shardings (the partitioner
    lowers the cross-shard strides to collectives)."""
    n = x.shape[-1]
    nb = x.ndim - 2  # number of batch dims
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    def stage(s, x):
        # s = 1..k ; m = 2^s ; h = m/2
        h = jnp.int32(1) << (s - 1)
        m_mask = (jnp.int32(1) << s) - 1
        j = idx & m_mask            # position within the size-m block
        is_lo = j < h
        partner = jnp.where(is_lo, idx + h, idx - h)
        jmod = j & (h - 1)          # twiddle index within half-block
        # twiddle exponent: jmod * (n / m) == jmod << (k - s)
        texp = jmod << (k - s)
        wj = _gather_last(tw, texp, mesh_axes)   # (L, n) gather
        wj = wj.reshape(wj.shape[:1] + (1,) * nb + wj.shape[1:])
        xp = _gather_last(x, partner, mesh_axes)
        mask = is_lo.reshape((1,) * (x.ndim - 1) + (n,))
        u = jnp.where(mask, x, xp)
        v = jnp.where(mask, xp, x)
        t = FR.mont_mul(wj, v)
        return jnp.where(mask, FR.add(u, t), FR.sub(u, t))

    return jax.lax.fori_loop(1, k + 1, stage, x, unroll=False)


def _bcast(table, x):
    """Reshape an (L, n) per-domain table for an (L, ..., n) operand."""
    nb = x.ndim - 2
    return table.reshape(table.shape[:1] + (1,) * nb + table.shape[1:])


def ntt(x, dd: DeviceDomain, mesh_axes=None):
    """Forward NTT: coefficients -> evaluations (natural order), (L, ..., n)."""
    from . import ntt4, ntt_mesh
    if ntt4.supported(dd.n, mesh_axes):
        return ntt4.ntt(x, dd)
    if ntt_mesh.supported(dd.n, mesh_axes):
        return ntt_mesh.ntt(x, dd, mesh_axes)
    xr = _gather_last(x, dd.bitrev, mesh_axes)
    return _ntt_core(xr, dd.tw, dd.k, mesh_axes)


def intt(x, dd: DeviceDomain, mesh_axes=None):
    """Inverse NTT: evaluations -> coefficients."""
    from . import ntt4, ntt_mesh
    if ntt4.supported(dd.n, mesh_axes):
        return ntt4.intt(x, dd)
    if ntt_mesh.supported(dd.n, mesh_axes):
        return ntt_mesh.intt(x, dd, mesh_axes)
    xr = _gather_last(x, dd.bitrev, mesh_axes)
    y = _ntt_core(xr, dd.tw_inv, dd.k, mesh_axes)
    n_inv = dd.n_inv.reshape((FR.L,) + (1,) * (x.ndim - 1))
    return FR.mont_mul(y, n_inv)


def coset_ntt(x, dd: DeviceDomain, mesh_axes=None):
    """Evaluate coefficients on the coset g*H."""
    scaled = FR.mont_mul(x, _bcast(dd.coset_pow, x))
    return ntt(scaled, dd, mesh_axes)


def coset_intt(x, dd: DeviceDomain, mesh_axes=None):
    """Interpolate from evaluations on the coset g*H."""
    c = intt(x, dd, mesh_axes)
    return FR.mont_mul(c, _bcast(dd.coset_pow_inv, x))
