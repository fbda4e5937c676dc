"""Double-float32 (error-free transformation) arithmetic for TPU.

TPU f64 is software float-float on the vector path (~49-bit, CLAUDE.md) and
every f64 elementwise op expands to a multi-op f32 sequence chosen by XLA.
The mixed-precision refinement outer loop needs exactly ONE high-precision
quantity — the true residual r = b − A·x — and the 5/7-point Laplacian has
structure XLA's generic f64 emulation cannot exploit:

- neighbor values are close (|x_e − x_i| ~ h·|∇u|), so FIRST-DIFFERENCE
  subtractions are nearly exact in f32 and carry tiny exact-error terms;
- the huge 1/h² coefficients multiply SECOND differences (~h²·u''), keeping
  every intermediate at O(result) instead of O(x/h²) — the cancellation that
  forces f64 in the naive form never happens;
- the exact rounding errors of those few subtractions are recoverable with
  TwoSum at ~3 f32 ops each.

``residual_ff`` evaluates r = (bh+bl) − A·(xh+xl) in pure f32 with one
compensation level: measured accuracy ~1e-7 of the naive-f32 error floor
(tests/test_ddf32.py pins it against CPU f64), i.e. residual entries good to
~eps²·‖A‖‖x‖ — far below the 1e-6-relative stopping targets, with no f64
(and no jax_enable_x64) anywhere in the program.

Reference parity note: this replaces the role of the f64 spmv in the
reference's residual check (solver/dirichlet_solver.cpp:147-161, all-double
there); the TPU-native design keeps the hot loop f32 end to end.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def two_sum(a, b) -> Pair:
    """Knuth TwoSum: a + b = s + e exactly (6 flops, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def two_prod(a, b) -> Pair:
    """Dekker/Veltkamp TwoProd: a * b = p + e exactly (f32 split at 12 bits).

    Assumes no overflow of 4097*a (true for all solver fields/coefficients).
    """
    p = a * b
    c = jnp.float32(4097.0) * a
    a_hi = c - (c - a)
    a_lo = a - a_hi
    c = jnp.float32(4097.0) * b
    b_hi = c - (c - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def split_f64(v) -> Pair:
    """f64 array -> (hi, lo) f32 pair with hi + lo == v to f32-pair precision."""
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(v.dtype)).astype(jnp.float32)
    return hi, lo


def pair_to_f64(p: Pair):
    return p[0].astype(jnp.float64) + p[1].astype(jnp.float64)


def pair_add_f32(p: Pair, d) -> Pair:
    """(hi, lo) + d (plain f32) -> normalized pair (TwoSum + low fold)."""
    s, e = two_sum(p[0], d)
    return two_sum(s, e + p[1])


def pair_value(p: Pair):
    """Best single-f32 value of the pair (fl(hi + lo))."""
    return p[0] + p[1]


def _is_pow2(v: float) -> bool:
    from math import frexp

    m, _ = frexp(abs(v))
    return m == 0.5 and v != 0.0


def _scaled_term(t: jnp.ndarray, e_sum: jnp.ndarray, c: float) -> Pair:
    """(main, err) of c·(t + e_sum) where t + e_sum is an exact pair.

    c a power of two (every 1/h² with power-of-two n on a unit box, incl.
    all bench domains): both products are exact, (c·t, c·e_sum). General c:
    split c into an f32 head + f64 residue (c = cf + c_lo to ~1e-16 rel),
    Dekker TwoProd on the head's main term, plain multiplies for the rest.
    """
    cf = jnp.float32(c)
    if _is_pow2(float(c)):
        return cf * t, cf * e_sum
    c_lo = jnp.float32(c - float(np.float32(c)))
    p, pe = two_prod(cf, t)
    return p, (pe + c_lo * t) + cf * e_sum


def _axis_diff2(xm: jnp.ndarray, lo, hi, c: float) -> Pair:
    """(main, err) of c·(x_lo − 2x + x_hi) for one axis via exact first
    differences: d1 = x_lo − x, d2 = x_hi − x, each with its TwoSum error;
    t = d1 + d2 likewise. All intermediates are O(h²·u''·c) = O(result)."""
    d1, e1 = two_sum(lo, -xm)
    d2, e2 = two_sum(hi, -xm)
    t, e3 = two_sum(d1, d2)
    return _scaled_term(t, (e1 + e2) + e3, c)


def _masked_shifts_2d(xm: jnp.ndarray):
    p = jnp.pad(xm, 1)
    return (
        (p[1:-1, :-2], p[1:-1, 2:]),  # x-axis west/east
        (p[:-2, 1:-1], p[2:, 1:-1]),  # y-axis north/south
    )


def _masked_shifts_3d(xm: jnp.ndarray):
    p = jnp.pad(xm, 1)
    return (
        (p[1:-1, 1:-1, :-2], p[1:-1, 1:-1, 2:]),
        (p[1:-1, :-2, 1:-1], p[1:-1, 2:, 1:-1]),
        (p[:-2, 1:-1, 1:-1], p[2:, 1:-1, 1:-1]),
    )


def residual_ff(interior, coeffs, b_pair: Pair, x_pair: Pair) -> Pair:
    """(rh, rl) ≈ (b − A·x) to f32-pair precision, all ops f32.

    ``interior``: bool mask (traced is fine); ``coeffs``: (cd, cx, cy[, cz])
    with cd = −2·Σ axis coefficients (the masked Laplacian of
    ops/stencil.py); ``b_pair``/``x_pair``: f32 (hi, lo) pairs.

    A·x decomposes per axis as c·(x_prev − 2x + x_next) exactly (same
    masking semantics as stencil_apply: out-of-interior neighbors are zero).
    A·xl is added in plain f32 — xl is rounding residue with no smoothness,
    so its apply has no cancellation to protect.
    """
    bh, bl = b_pair
    xh, xl = x_pair
    ndim = xh.ndim
    axis_cs = coeffs[1:]
    xm = jnp.where(interior, xh, 0.0)
    shifts = _masked_shifts_3d(xm) if ndim == 3 else _masked_shifts_2d(xm)

    mains, errs = [], []
    for (lo, hi), c in zip(shifts, axis_cs):
        m, e = _axis_diff2(xm, lo, hi, c)
        mains.append(m)
        errs.append(e)

    # exact sum of the axis mains
    S, es = two_sum(mains[0], mains[1])
    for m in mains[2:]:
        S, e = two_sum(S, m)
        es = es + e

    # plain-f32 corrections: axis errors + A·xl (cheap standalone stencil)
    from iterative_solvers_tpu.ops.stencil import stencil_apply, stencil_apply_3d

    apply = stencil_apply_3d if ndim == 3 else stencil_apply
    corr = sum(errs) + apply(xl, interior, *coeffs)
    # the operator's cd is −2·fl64(Σc) while the difference form implies the
    # EXACT −2Σc; fold the f64 rounding gap δ = cd + 2Σc back in
    from math import fsum

    delta = fsum([coeffs[0]] + [2.0 * c for c in axis_cs])
    if delta != 0.0:
        corr = corr + jnp.float32(delta) * xm

    t1, e_t1 = two_sum(bh, -S)
    rl = ((bl - es) - corr) + e_t1
    rh, rl = two_sum(t1, rl)
    z = jnp.zeros_like(rh)
    return jnp.where(interior, rh, z), jnp.where(interior, rl, z)
