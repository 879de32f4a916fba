"""SSIM in pure JAX (11x11 separable Gaussian window), matching the
reference's ssim_loss / ssim_img (/root/reference/scripts/gaussian/
loss_utils.py:36-88) closely enough for loss parity."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


@functools.lru_cache()
def _window(size=11, sigma=1.5):
    import numpy as np
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return tuple(g.tolist())


@functools.lru_cache()
def _band_matrix(n, size=11):
    """Banded Toeplitz blur matrix (n, n) == SAME-padded 1-D conv."""
    import numpy as np
    g = np.asarray(_window(size), np.float32)
    M = np.zeros((n, n), np.float32)
    r = size // 2
    for k in range(size):
        off = k - r
        d = np.full(n - abs(off), g[k], np.float32)
        M += np.diag(d, off)
    return M


def _blur(img, size=11):
    """Separable Gaussian blur; img (C, H, W), SAME (zero) padding.

    Expressed as two banded-matrix MATMULS instead of 1-channel convs —
    depth-1 convolutions run far off the MXU's fast path on TPU and showed
    up as ~2 ms/train-iteration in profiles; the (H,H)/(W,W) banded
    contractions are microseconds."""
    C, H, W = img.shape
    Mh = jnp.asarray(_band_matrix(H, size), img.dtype)
    Mw = jnp.asarray(_band_matrix(W, size), img.dtype)
    x = jnp.einsum("hk,ckw->chw", Mh, img,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("chw,wk->chk", x.astype(img.dtype), Mw,
                      preferred_element_type=jnp.float32).astype(img.dtype)


def ssim_map(img1, img2):
    """Per-pixel SSIM, images (C, H, W) in [0, 1]. Returns (C, H, W)."""
    mu1 = _blur(img1)
    mu2 = _blur(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _blur(img1 * img1) - mu1_sq
    s2 = _blur(img2 * img2) - mu2_sq
    s12 = _blur(img1 * img2) - mu12
    return ((2 * mu12 + _C1) * (2 * s12 + _C2)
            / ((mu1_sq + mu2_sq + _C1) * (s1 + s2 + _C2)))


def ssim(img1, img2, mask=None):
    """Mean SSIM; optional (H, W) mask."""
    m = ssim_map(img1, img2)
    if mask is None:
        return jnp.mean(m)
    mask = mask.astype(m.dtype)
    return jnp.sum(m * mask[None]) / jnp.clip(jnp.sum(mask) * m.shape[0], 1.0)
