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
import numpy as np

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
    shapes); sharded transforms use the fused one-region sharded iterate
    (in-kernel shrink on the Pallas path) when ``lam`` is static."""
    from ..parallel.sharded import ShardedNDDWT
    from ..plan import NDDWT

    if not hasattr(lam, "shape"):
        if isinstance(transform, NDDWT):
            _, xr = transform.dec_rec(
                v, level, threshold=float(lam), band_axis=0
            )
            return xr
        if isinstance(transform, ShardedNDDWT):
            _, xr = transform.dec_rec(v, level, threshold=float(lam))
            return xr
    y = _dec(transform, v, level)
    y = _shrink_details(y, lam)
    return _rec(transform, y)


def _prox_split(transform, v_pair, lam, level):
    """Split-complex prox: ``W^T shrink_mag(W v, lam)`` with the joint
    re/im magnitude shrink (the prox of the *complex* l1 norm — the
    reference's MRI contract, ``Functions/nd_dwt_1D.m:57-61``). A static
    ``lam`` routes through the fused ``dec_rec_split`` iterate (one kernel
    launch on flat-served single-device shapes; one shard_map region on
    the multi-chip path); a traced ``lam`` composes the split transforms
    with the shared magnitude shrink."""
    from ..parallel.sharded import ShardedNDDWT
    from ..plan import NDDWT

    if not isinstance(transform, (NDDWT, ShardedNDDWT)):
        raise TypeError(
            f"expected NDDWT or ShardedNDDWT, got {type(transform).__name__}"
        )
    if not hasattr(lam, "shape"):
        _, xr = transform.dec_rec_split(v_pair, level, threshold=float(lam))
        return xr
    # Traced lam: generic composition (works for both transform kinds).
    from .denoise import soft_threshold_mag_pair

    y = transform.dec_split(v_pair, level)  # (2, B, *spatial)
    return transform.rec_split(soft_threshold_mag_pair(y, lam))


def _fista_schedule(iters, lam, step):
    """Deterministic FISTA schedule: per-iteration shrink thresholds
    (``lam*step``, the prox scaling) and momentum coefficients
    ``(t_k - 1)/t_{k+1}`` with ``t_1 = 1``."""
    t = 1.0
    moms = []
    for _ in range(iters):
        t_next = 0.5 * (1.0 + float(np.sqrt(1.0 + 4.0 * t * t)))
        moms.append((t - 1.0) / t_next)
        t = t_next
    return [float(lam) * float(step)] * iters, moms


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


def _fista_stepped(transform, b, mask, lam, level, moms, step):
    """Big-shape FISTA fast path: every iterate is Pallas end-to-end —
    the shrink rides the tiled dec kernels (``dec_rec`` threshold fusion)
    and the momentum + data-term glue is one fused elementwise kernel
    (``ops.pallas_elemwise.fista_step``) instead of ~7 XLA passes at this
    device's ~55 GB/s. Returns ``None`` when the backend/shape is not
    served (the caller falls through to the generic scan loop)."""
    from ..ops import pallas_elemwise

    if jnp.iscomplexobj(b):
        # Let the generic loop handle (and, on complex-less accelerator
        # backends, loudly reject via _resolve_path) complex data — a
        # silent cast here would drop the imaginary part.
        return None
    if transform._resolve_path(is_complex=False) != "pallas":
        return None
    if not pallas_elemwise.supported(transform.shape, transform.real_dtype):
        return None
    dt = transform.real_dtype
    b = jnp.asarray(b, dt)
    mask = jnp.asarray(mask, dt)
    x0 = mask * b
    v0 = x0 - step * (mask * (mask * x0 - b))  # z_0 = x_0 (once, pre-loop)
    thr = float(lam) * float(step)

    def body(carry, mom):
        x_prev, v = carry
        _, x_new = transform.dec_rec(v, level, threshold=thr, band_axis=0)
        v_next = pallas_elemwise.fista_step(
            x_new, x_prev, mask, b, mom, float(step)
        )
        return (x_new, v_next), None

    (x, _), _ = jax.lax.scan(
        body, (x0, v0), jnp.asarray(moms, jnp.float32)
    )
    return x


def _fista_stepped_split(transform, b_pair, mask, lam, level, moms, step):
    """Big-shape split-complex FISTA fast path: per-component Pallas
    transforms + one fused Pallas magnitude-shrink pass (detail bands,
    both components) + one fused glue pass per iterate — no XLA
    full-array elementwise anywhere in the loop. ``None`` when not
    served."""
    from ..ops import pallas_elemwise

    if jnp.iscomplexobj(b_pair):
        return None
    if transform._resolve_path(is_complex=False) != "pallas":
        return None
    shape = transform.shape
    if not pallas_elemwise.supported((2,) + shape, transform.real_dtype):
        return None
    nsp = int(np.prod(shape))
    if nsp % pallas_elemwise._LANES:
        return None
    dt = transform.real_dtype
    b_pair = jnp.asarray(b_pair, dt)
    mask2 = jnp.broadcast_to(jnp.asarray(mask, dt)[None], (2,) + shape)
    x0 = mask2 * b_pair
    v0 = x0 - step * (mask2 * (mask2 * x0 - b_pair))
    thr = float(lam) * float(step)

    # Per-component dispatchers called directly (no linear_call wrapper:
    # the solver loop needs no autodiff, and the ordered-io effect of the
    # wrapped form cannot ride a closed call under lax.scan in the
    # interpret-mode CI).
    from ..ops import pallas_kernels as pk

    taps_np = tuple(np.asarray(t) for t in transform.taps_hp)

    def prox(v):
        y = jnp.stack([
            pk._dec_dispatch(v[0], taps_np, level),
            pk._dec_dispatch(v[1], taps_np, level),
        ])
        ys = pallas_elemwise.mag_shrink_pair(y, thr)
        if ys is None:  # pragma: no cover - gated above
            from .denoise import soft_threshold_mag_pair

            ys = soft_threshold_mag_pair(y, thr)
        return jnp.stack([
            pk._rec_dispatch(ys[0], taps_np, level, transform.preserve_l2),
            pk._rec_dispatch(ys[1], taps_np, level, transform.preserve_l2),
        ])

    def body(carry, mom):
        x_prev, v = carry
        x_new = prox(v)
        v_next = pallas_elemwise.fista_step(
            x_new, x_prev, mask2, b_pair, mom, float(step)
        )
        return (x_new, v_next), None

    (x, _), _ = jax.lax.scan(
        body, (x0, v0), jnp.asarray(moms, jnp.float32)
    )
    return x


def fista_inpaint(transform, b, mask, lam, level=2, iters=20, step=1.0):
    """FISTA for image-domain masked observation (inpainting):
    ``min_x 0.5 ||M ⊙ x - b||^2 + lam ||W x||_1``.

    All-real: runs on accelerators whose runtime lacks complex arithmetic
    (the available TPU backend), unlike the masked-Fourier variant.

    On flat-kernel shapes with a single-device plan and a scalar ``lam``,
    the ENTIRE solve runs in one kernel launch (solver state resident in
    VMEM, schedule in SMEM) — see ``NDDWT.dec_rec_n`` for the rationale.
    """
    from ..plan import NDDWT

    if isinstance(transform, NDDWT) and not hasattr(lam, "shape"):
        lams, moms = _fista_schedule(iters, lam, step)
        xr = transform._fista_fused(b, mask, level, lams, moms, float(step))
        if xr is not None:
            return xr
        xr = _fista_stepped(transform, b, mask, lam, level, moms, step)
        if xr is not None:
            return xr
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


def fista_inpaint_split(transform, b_pair, mask, lam, level=2, iters=20,
                        step=1.0):
    """FISTA for image-domain masked observation of COMPLEX data carried as
    a split re/im pair: ``min_x 0.5 ||M ⊙ x - b||^2 + lam ||W x||_{1,c}``
    with ``x`` complex, stored as ``(2, *shape)`` real, and ``||.||_{1,c}``
    the complex l1 norm (joint re/im magnitude).

    TPU-safe on the complex-less backend (no complex op ever executes; the
    filters are real so the components transform independently, matching the
    reference's native complex handling, ``Functions/nd_dwt_3D.m:150-154``).
    ``transform`` may be a single-device ``NDDWT`` (fused one-launch
    ``dec_rec_split`` iterate on flat-served shapes) or a ``ShardedNDDWT``
    (complex volumes on the multi-chip Pallas path). ``mask`` is real with
    shape ``transform.shape`` / the plan's spatial shape; ``b_pair`` is
    ``(2, *shape)``. On flat-kernel shapes with a single-device plan the
    whole complex solve is ONE kernel launch (both components resident).
    """
    from ..plan import NDDWT

    if isinstance(transform, NDDWT) and not hasattr(lam, "shape"):
        lams, moms = _fista_schedule(iters, lam, step)
        xr = transform._fista_fused(b_pair, mask, level, lams, moms,
                                    float(step), split=True)
        if xr is not None:
            return xr
        xr = _fista_stepped_split(transform, b_pair, mask, lam, level,
                                  moms, step)
        if xr is not None:
            return xr
    x = mask[None] * b_pair

    def prox_grad(z):
        grad = mask[None] * (mask[None] * z - b_pair)
        v = z - step * grad
        return _prox_split(transform, v, lam * step, level)

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
