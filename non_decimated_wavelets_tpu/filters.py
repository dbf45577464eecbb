"""Daubechies wavelet filter construction for the non-decimated DWT.

Capability parity with the reference filter layer (``Functions/wave_filters.m``):
the reference hard-codes db1..db10 low-pass decomposition taps at ~60-digit
precision (``wave_filters.m:19-156``), derives the high-pass by time-reversal
plus alternating sign flips (``wave_filters.m:162-169``), and finally
time-reverses both filters (``wave_filters.m:171-172``) so that the later
frequency-domain multiply implements *correlation* with the canonical
(extremal-phase) taps.

This module instead *computes* the Daubechies taps by spectral factorization
of the Daubechies half-band polynomial, with Newton root polishing in 80-bit
``numpy.longdouble`` arithmetic.  That reproduces the reference's db1..db10
values to <1e-15 (verified in ``tests/test_filters.py``) and additionally
supports any ``dbN`` beyond 10 — a capability superset.

Conventions (exactly the reference's):

* ``daubechies_taps(p)`` returns the extremal-phase scaling taps ``t`` with
  ``sum(t) == sqrt(2)`` — the values in the reference's table.
* ``decomposition_filters(name)`` returns ``(low_d, hi_d)`` in the
  reference's *returned* orientation (both time-reversed, high-pass signs on
  the appropriate parity), matching ``wave_filters.m:162-172``.
* ``correlation_taps(name)`` returns the pair ``(lo, hi)`` such that the
  spatial-domain transform is the circular correlation
  ``y[n] = sum_j tap[j] * x[(n + j - (K//2 - 1)) % N]`` — the closed form of
  the reference's FFT path (kernel = reversed taps, advanced by K/2 samples
  via the phase factor at e.g. ``Functions/nd_dwt_1D.m:274``).
"""

from __future__ import annotations

import functools
import math
import re

import numpy as np

__all__ = [
    "daubechies_taps",
    "symlet_taps",
    "decomposition_filters",
    "correlation_taps",
    "qmf_highpass",
    "frequency_response",
    "parse_wavelet_name",
]

_LONG = np.longdouble
_CLONG = np.clongdouble


def _parse_family(name: str):
    """('db'|'sym', p) from a wavelet name.

    ``dbN`` (extremal phase) covers the reference's whole table
    (``wave_filters.m:19-156``); ``symN`` (least-asymmetric Daubechies,
    N >= 2 — sym1 degenerates to db1/haar) is a capability superset: the
    same orthonormal half-band factorization with the near-linear-phase
    root selection, the family practical MRI pipelines default to.
    """
    if not isinstance(name, str):
        raise TypeError(f"Wavelet name must be a string, got {type(name)!r}")
    low = name.strip().lower()
    if low in ("haar", "db1", "sym1"):
        return "db", 1
    m = re.fullmatch(r"(db|sym)(\d+)", low)
    if m is None:
        raise ValueError(
            f"Unknown wavelet name {name!r}: expected 'haar', 'dbN' or "
            "'symN' (N >= 1)"
        )
    p = int(m.group(2))
    if p < 1:
        raise ValueError(f"Wavelet order must be >= 1, got {name!r}")
    fam = m.group(1)
    # Practical order caps (the same bounds PyWavelets ships): beyond
    # db38 the double-seeded root polish loses the <1e-15 tap accuracy
    # contract, and the symlet least-asymmetry search enumerates
    # 2^((p-1)/2) conj-closed flip choices — sym99 would be 2^49 combos
    # (observed: an unbounded 'sym99' construction simply hangs).
    cap = 38 if fam == "db" else 20
    if p > cap:
        raise ValueError(
            f"Wavelet order {p} exceeds the supported maximum "
            f"{fam}{cap} (got {name!r})"
        )
    return fam, p


def parse_wavelet_name(name: str) -> int:
    """'db4' -> 4 (also accepts 'symN'; 'haar' is db1, as in the reference
    Haar classes). Returns the vanishing-moment order."""
    return _parse_family(name)[1]


def _polish_roots(coeffs: np.ndarray, roots: np.ndarray, iters: int = 60) -> np.ndarray:
    """Newton-polish polynomial roots in 80-bit extended precision.

    ``coeffs`` are highest-degree-first (np.polyval convention), promoted to
    longdouble.  Double-precision seed roots from ``np.roots`` are refined to
    ~1e-18 relative accuracy, which keeps the final taps accurate to <1e-16
    even for db10 (degree-18 factorization polynomial).
    """
    c = coeffs.astype(_CLONG)
    dc = c[:-1] * np.arange(len(c) - 1, 0, -1, dtype=_LONG)
    r = roots.astype(_CLONG)
    for _ in range(iters):
        num = np.polyval(c, r)
        den = np.polyval(dc, r)
        step = np.where(den != 0, num / np.where(den == 0, 1, den), 0)
        r_new = r - step
        if np.all(np.abs(r_new - r) <= 1e-22 * np.maximum(np.abs(r_new), 1)):
            r = r_new
            break
        r = r_new
    return r


@functools.lru_cache(maxsize=None)
def _halfband_inside_roots(p: int):
    """The p-1 unit-circle-interior roots of ``z^{p-1} P(y(z))``, polished.

    P(y) = sum_{k<p} C(p-1+k, k) y^k with y = (2 - z - 1/z)/4; the
    degree-2(p-1) polynomial's roots pair as (r, 1/r) and are closed under
    conjugation. Every orthonormal Daubechies-class filter picks exactly
    one root of each reciprocal pair; the families differ only in which.
    """
    k = np.arange(p)
    Pc = np.array([math.comb(p - 1 + kk, kk) for kk in k], dtype=_LONG)

    n = 2 * p - 1  # number of z-coefficients for degree 2(p-1)
    poly = np.zeros(n, dtype=_LONG)  # index i <-> z^{i}, after shift by p-1
    y1 = np.array([-0.25, 0.5, -0.25], dtype=_LONG)  # z^{-1},z^0,z^{1} of y
    cur = np.array([1.0], dtype=_LONG)  # y^0
    for kk in range(p):
        off = p - 1 - kk
        poly[off : off + len(cur)] += Pc[kk] * cur
        if kk + 1 < p:
            cur = np.convolve(cur, y1)

    coeffs_high_first = poly[::-1]  # np.polyval convention
    seed = np.roots(coeffs_high_first.astype(np.float64))
    roots = _polish_roots(coeffs_high_first, seed)
    inside = roots[np.abs(roots) < 1]
    if len(inside) != p - 1:
        # Fall back to picking the p-1 smallest-magnitude roots.
        inside = roots[np.argsort(np.abs(roots))][: p - 1]
    return inside


def _assemble_taps(p: int, chosen_roots) -> np.ndarray:
    """Scaling taps from a chosen conj-closed root set:
    ``h(z) = c * ((1+z)/2)^p * prod (z - r_i)``, sum = sqrt(2),
    oriented with the dominant taps in the first half."""
    q = np.array([1.0], dtype=_CLONG)
    for r in chosen_roots:
        q = np.convolve(q, np.array([1.0, -r], dtype=_CLONG))
    q = np.real(q).astype(_LONG)

    binom = np.array([1.0], dtype=_LONG)
    for _ in range(p):
        binom = np.convolve(binom, np.array([0.5, 0.5], dtype=_LONG))
    h = np.convolve(binom, q)
    h = h * (np.sqrt(_LONG(2)) / np.sum(h))
    if np.argmax(np.abs(h)) > len(h) // 2:
        h = h[::-1]
    return h


@functools.lru_cache(maxsize=None)
def _daubechies_taps_long(p: int):
    """Extremal-phase Daubechies scaling taps, longdouble, sum = sqrt(2):
    keep every |r| < 1 root (minimum phase)."""
    if p == 1:
        s = np.sqrt(_LONG(2))
        return np.array([1 / s, 1 / s], dtype=_LONG)
    return _assemble_taps(p, tuple(_halfband_inside_roots(p)))


def _phase_nonlinearity(h: np.ndarray) -> float:
    """Max deviation of the transfer-function phase from its best lin fit
    over (0, 0.75*pi) — the least-asymmetry selection functional (the
    lowpass's p-fold zero at pi makes the phase ill-conditioned there, so
    the window stops short of it)."""
    hf = np.asarray(h, np.float64)
    w = np.linspace(0.0, 0.75 * np.pi, 193)[1:]
    H = np.exp(-1j * np.outer(w, np.arange(len(hf)))) @ hf
    ph = np.unwrap(np.angle(H))
    slope = float((ph * w).sum() / (w * w).sum())
    return float(np.abs(ph - slope * w).max())


@functools.lru_cache(maxsize=None)
def _symlet_taps_long(p: int):
    """Least-asymmetric Daubechies (symlet) scaling taps, longdouble.

    Same half-band factorization as ``dbN``; instead of taking all
    interior roots, enumerate the conj-closed flip choices (each real
    root or conjugate pair may be swapped for its reciprocal partner) and
    keep the combination minimizing :func:`_phase_nonlinearity`. Root
    selection conventions differ between libraries by reflection/shift;
    this one is deterministic and verified by invariants (orthonormality,
    p vanishing moments, asymmetry < dbN) in ``tests/test_filters.py``.
    """
    if p == 1:
        return _daubechies_taps_long(1)
    inside = _halfband_inside_roots(p)
    # Flip units: real roots individually, conjugate pairs together.
    units = []
    used = np.zeros(len(inside), bool)
    for i, r in enumerate(inside):
        if used[i]:
            continue
        used[i] = True
        if abs(np.imag(r)) < 1e-14:
            units.append((np.real(r).astype(_LONG) + 0j,))
        else:
            # find the conjugate partner
            j = int(np.argmin(np.abs(inside - np.conj(r)) + used * 1e9))
            used[j] = True
            units.append((r, inside[j]))
    best = None
    best_measure = None
    for mask in range(1 << len(units)):
        chosen = []
        for u, unit in enumerate(units):
            if (mask >> u) & 1:
                chosen.extend(1.0 / np.conj(rr) for rr in unit)
            else:
                chosen.extend(unit)
        h = _assemble_taps(p, tuple(chosen))
        m = _phase_nonlinearity(h)
        if best_measure is None or m < best_measure - 1e-12:
            best, best_measure = h, m
    return best


def daubechies_taps(p: int, dtype=np.float64) -> np.ndarray:
    """Extremal-phase Daubechies-p scaling taps (2p taps, sum = sqrt(2)).

    Matches the reference's hard-coded tables (``wave_filters.m:19-156``)
    to <1e-15 for p = 1..10; also valid for larger p (capped at db38, see
    ``_parse_family``).
    """
    _parse_family(f"db{int(p)}")  # order-cap validation
    return np.asarray(_daubechies_taps_long(int(p)), dtype=dtype)


def qmf_highpass(taps: np.ndarray) -> np.ndarray:
    """Quadrature-mirror high-pass correlation taps from low-pass taps.

    ``u[j] = t[K-1-j]`` with the sign flipped at odd ``j`` — the closed form
    of the reference's reverse + sign-flip + reverse dance
    (``wave_filters.m:164-172``) expressed directly in correlation
    orientation.  Haar check: ``u = [1/sqrt(2), -1/sqrt(2)]`` so the H band is
    ``(x[n] - x[n+1])/sqrt(2)``, matching the reference Haar stencil
    (``Functions/harr_nddwt_2D.m:250-287``).
    """
    t = np.asarray(taps)
    K = len(t)
    if K % 2:
        raise ValueError(
            "Odd-length filters are unsupported (the reference's odd-length "
            "branch is dead code; all Daubechies filters have even length)"
        )
    u = t[::-1].copy()
    u[1::2] = -u[1::2]
    return u


def symlet_taps(p: int, dtype=np.float64) -> np.ndarray:
    """Least-asymmetric Daubechies-p (symlet) scaling taps (2p taps,
    sum = sqrt(2)) — capability superset beyond the reference's db table.
    Capped at sym20 (the flip search is exponential; see
    ``_parse_family``)."""
    _parse_family(f"sym{int(p)}")  # order-cap validation
    return np.asarray(_symlet_taps_long(int(p)), dtype=dtype)


def _scaling_taps_long(name: str) -> np.ndarray:
    family, p = _parse_family(name)
    if family == "sym":
        return _symlet_taps_long(p)
    return _daubechies_taps_long(p)


def correlation_taps(name: str, dtype=np.float64):
    """(lo, hi) taps for the spatial-domain circular correlation form.

    The transform along one axis is
    ``y_c[n] = sum_j taps_c[j] * x[(n + j - (K//2 - 1)) % N]``,
    which is numerically identical (to ~1e-16) to the reference's FFT path
    with its half-length phase advance (``Functions/nd_dwt_1D.m:274,288-289``).
    """
    lo = np.asarray(_scaling_taps_long(name), dtype=np.longdouble)
    hi = qmf_highpass(lo)
    return lo.astype(dtype), hi.astype(dtype)


def decomposition_filters(name: str, dtype=np.float64):
    """(low_d, hi_d) in the reference's returned orientation.

    Equals the output of ``wave_filters.m``: both filters time-reversed, with
    the high-pass carrying alternating signs (``wave_filters.m:162-172``).
    Provided for API parity; the engine uses :func:`correlation_taps`.
    """
    lo, hi = correlation_taps(name, dtype=np.longdouble)
    return lo[::-1].astype(dtype), hi[::-1].astype(dtype)


def frequency_response(name: str, n: int, dtype=np.complex128):
    """Per-axis frequency-domain filter pair, shape (2, n), reference scaling.

    ``F_c = shift * fft(reversed_taps, n)`` with
    ``shift[k] = exp(2j*pi*(K/2)*k/n)`` — exactly the cached quantity the
    reference builds per axis in every class constructor
    (``Functions/nd_dwt_1D.m:274,288-289``), before the optional
    ``1/sqrt(2^d)`` tight-frame scale.

    Computed here from the correlation taps directly:
    ``F_c[k] = conj(fft(padded_corr_taps rolled by -(K//2-1)))`` — we instead
    evaluate the equivalent closed form via an explicit DFT in float64.
    """
    lo_c, hi_c = correlation_taps(name, dtype=np.float64)
    K = len(lo_c)
    if K > n:
        raise ValueError(
            f"Axis of length {n} is shorter than the {name} filter ({K} taps); "
            "the reference raises the same error (Functions/nd_dwt_3D.m:277-286)"
        )
    # y = corr(x, t) anchored at offset o = K//2 - 1:
    #   Y[k] = X[k] * sum_j t[j] exp(+2j pi k (j - o) / n)  = X[k] * F[k]
    o = K // 2 - 1
    j = np.arange(K)
    k = np.arange(n)
    ph = np.exp(2j * np.pi * np.outer(k, (j - o)) / n)  # (n, K)
    F = np.stack([ph @ lo_c, ph @ hi_c], axis=0)  # (2, n)
    return F.astype(dtype)
