"""Permutation argument: sigma polynomials and grand products (host).

Mirrors /root/reference/plonk-core/src/permutation/mod.rs:
- compute_sigma_permutations (:101-136): cycle-following shift-by-one
- compute_permutation_lagrange (:139-169): encode via roots x {1,K1,K2,K3}
- compute_permutation_poly (:652-752): per-gate ratios + prefix product
- compute_lookup_permutation_poly (:754-801)

The device port replaces the prefix product with an associative scan
(SURVEY.md §2.3.4); this host version is the golden model.
"""

from __future__ import annotations

from ..fields import host
from ..fields.host import R, batch_inv
from ..circuit.composer import LEFT, RIGHT, OUTPUT, FOURTH, K1, K2, K3
from ..poly import ntt


def compute_sigma_permutations(variable_map, n: int):
    """Returns 4 lists of WireData tuples (kind, index)."""
    sigmas = [[(LEFT, i) for i in range(n)],
              [(RIGHT, i) for i in range(n)],
              [(OUTPUT, i) for i in range(n)],
              [(FOURTH, i) for i in range(n)]]
    for wire_data in variable_map:
        for wire_index, current in enumerate(wire_data):
            next_wire = wire_data[(wire_index + 1) % len(wire_data)]
            kind, index = current
            sigmas[kind][index] = next_wire
    return sigmas


_KS = [1, K1, K2, K3]


def sigma_lagrange(sigma_mapping, domain: host.Domain):
    roots = domain.elements()
    return [_KS[kind] * roots[index] % R for (kind, index) in sigma_mapping]


def compute_sigma_polynomials(variable_map, n: int, domain: host.Domain):
    """Returns (sigma_polys (4 coeff lists), sigma_lagranges (4 eval lists))."""
    sigmas = compute_sigma_permutations(variable_map, n)
    lagranges = [sigma_lagrange(s, domain) for s in sigmas]
    polys = [ntt.intt_host(lag, domain) for lag in lagranges]
    return polys, lagranges


def compute_permutation_poly(domain: host.Domain, wires, beta: int,
                             gamma: int, sigma_polys):
    """z(X) grand product; returns coefficient list."""
    n = domain.size
    sigma_evals = [ntt.ntt_host(sp, domain) for sp in sigma_polys]
    roots = domain.elements()
    numerators = []
    denominators = []
    for i in range(n):
        num = 1
        den = 1
        root = roots[i]
        for k in range(4):
            num = num * ((wires[k][i] + beta * _KS[k] * root + gamma) % R) % R
        for k in range(4):
            den = den * ((wires[k][i] + beta * sigma_evals[k][i] + gamma) % R) % R
        numerators.append(num)
        denominators.append(den)
    den_inv = batch_inv(denominators)
    ratios = [a * b % R for a, b in zip(numerators, den_inv)]
    z = [1]
    state = 1
    for s in ratios:
        state = state * s % R
        z.append(state)
    z.pop()  # drop the (n+1)th element
    return ntt.intt_host(z, domain)


def compute_lookup_permutation_poly(domain: host.Domain, f, t, h1, h2,
                                    delta: int, epsilon: int):
    """z2(X) plookup grand product; returns coefficient list."""
    n = domain.size
    assert len(f) == len(t) == len(h1) == len(h2) == n
    t_next = t[1:] + [t[0]]
    h1_next = h1[1:] + [h1[0]]
    one_plus_delta = (1 + delta) % R
    eps_opd = epsilon * one_plus_delta % R
    nums = []
    dens = []
    for i in range(n):
        num = one_plus_delta * ((epsilon + f[i]) % R) % R \
            * ((eps_opd + t[i] + delta * t_next[i]) % R) % R
        den = ((eps_opd + h1[i] + h2[i] * delta) % R) \
            * ((eps_opd + h2[i] + h1_next[i] * delta) % R) % R
        nums.append(num)
        dens.append(den)
    den_inv = batch_inv(dens)
    ratios = [a * b % R for a, b in zip(nums, den_inv)]
    p = [1]
    state = 1
    for s in ratios:
        state = state * s % R
        p.append(state)
    p.pop()
    return ntt.intt_host(p, domain)
