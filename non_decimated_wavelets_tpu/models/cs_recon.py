"""Compressed-sensing MRI reconstruction with an NDDWT sparsifier.

The reference library was written for exactly this loop — iterative
algorithms applying the same transform hundreds of times (its design
rationale: precomputed filter cache, ``README.md:2``, author affiliation in
``Functions/nd_dwt_1D.m:57-61``). Here is the loop itself, TPU-native:
FISTA for

    min_x  0.5 || M ⊙ F x - b ||^2 + lam || W x ||_1

with ``F`` the (orthonormal) FFT, ``M`` a sampling mask, and ``W`` the
non-decimated DWT. ``transform`` may be a single-device ``NDDWT`` plan
(band-last) or a ``ShardedNDDWT`` (band-first, spatial axes sharded over the
mesh) — the same code scales from one chip to a pod slice.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .denoise import soft_threshold


def _dec(transform, x, level):
    from ..parallel.sharded import ShardedNDDWT

    if isinstance(transform, ShardedNDDWT):
        return transform.dec(x, level)
    return transform.dec(x, level, band_axis=0)


def _rec(transform, y):
    from ..parallel.sharded import ShardedNDDWT

    if isinstance(transform, ShardedNDDWT):
        return transform.rec(y)
    return transform.rec(y, band_axis=0)


def _shrink_details(y, lam):
    """Soft-threshold the detail bands only (band-first layout): the
    approximation band carries the low-frequency content the L1 penalty
    should not shrink — consistent with ``denoise.denoise``."""
    return jnp.concatenate([y[:1], soft_threshold(y[1:], lam)], axis=0)


def _prox(transform, v, lam, level):
    """``W^T soft(W v, lam)`` (details only). Single-device plans route
    through the fused ``dec_rec`` iterate (one kernel launch on resident
    shapes); sharded transforms compose dec/shrink/rec."""
    from ..plan import NDDWT

    if isinstance(transform, NDDWT) and not hasattr(lam, "shape"):
        _, xr = transform.dec_rec(v, level, threshold=float(lam), band_axis=0)
        return xr
    y = _dec(transform, v, level)
    y = _shrink_details(y, lam)
    return _rec(transform, y)


def _fwd(x, mask):
    axes = tuple(range(x.ndim))
    return mask * jnp.fft.fftn(x, axes=axes, norm="ortho")


def _adj(k, mask):
    axes = tuple(range(k.ndim))
    return jnp.fft.ifftn(mask * k, axes=axes, norm="ortho")


def ista_step(transform, x, b, mask, lam, step, level):
    """One proximal-gradient step: data-consistency + wavelet shrinkage.

    With ``preserve_l2`` the transform is a tight frame, so
    ``prox_{lam||W.||_1}(v) ≈ W^T soft(W v, lam)`` is the standard
    cycle-spinning surrogate.
    """
    grad = _adj(_fwd(x, mask) - b, mask)
    v = x - step * grad
    return _prox(transform, v, lam * step, level)


def fista_cs_mri(transform, b, mask, lam, level=2, iters=20, step=1.0):
    """FISTA on the masked-Fourier CS problem; returns the reconstruction.

    Requires complex FFT support (CPU backends; the available TPU runtime
    has none — use :func:`fista_inpaint` there, or split-complex data with
    an image-domain operator).

    ``b``: observed k-space (same shape as the image), ``mask``: 0/1
    sampling mask. The loop body is a single jitted program; the transform's
    cached filter bank makes every iteration cheap — the reference's whole
    raison d'être, now fused end-to-end by XLA.
    """
    x = _adj(b, mask)

    def body(carry, _):
        x, z, t = carry
        x_new = ista_step(transform, z, b, mask, lam, step, level)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, z_new, t_new), None

    (x, _, _), _ = jax.lax.scan(body, (x, x, jnp.asarray(1.0, x.real.dtype)), None, length=iters)
    return x


def fista_inpaint(transform, b, mask, lam, level=2, iters=20, step=1.0):
    """FISTA for image-domain masked observation (inpainting):
    ``min_x 0.5 ||M ⊙ x - b||^2 + lam ||W x||_1``.

    All-real: runs on accelerators whose runtime lacks complex arithmetic
    (the available TPU backend), unlike the masked-Fourier variant.
    """
    x = mask * b

    def prox_grad(z):
        grad = mask * (mask * z - b)
        v = z - step * grad
        return _prox(transform, v, lam * step, level)

    def body(carry, _):
        x, z, t = carry
        x_new = prox_grad(z)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, z_new, t_new), None

    (x, _, _), _ = jax.lax.scan(
        body, (x, x, jnp.asarray(1.0, x.dtype)), None, length=iters
    )
    return x
