"""Image quality / filter kernels for training-data curation, numpy only.

A 100 TB image crawl keeps only a fraction of what it fetches; the gates
that decide are cheap per-image statistics computed right after decode.
This module provides the standard curation signals as pure numpy kernels
(called per-image inside Arrow-batched ``mapInPandas`` — zero per-row
Python at plan level, same discipline as functions/imagecodec.py):

- ``ahash64`` / ``dhash64`` / ``whash64`` — the three classic perceptual
  hashes besides DCT pHash (average hash: 8x8 area-mean threshold;
  difference hash: 8x9 horizontal gradient signs; wavelet hash: 3-level
  2D Haar of a 64x64 gray plane, 8x8 LL band thresholded by median with
  the DC term suppressed — the ``imagehash`` whash algorithm).
- ``laplacian_var`` — blur detector: variance of the 4-neighbour
  Laplacian of the luma plane ("variance of Laplacian" focus measure,
  Pech-Pacheco et al., ICPR 2000). Low = blurry/flat.
- ``gray_entropy`` — Shannon entropy (bits) of the 256-bin luma
  histogram. Near-0 = synthetic/flat graphics; ~8 = dense natural image.
- ``colorfulness`` — Hasler & Süsstrunk (SPIE 2003) opponent-axis
  metric: sqrt(var(rg)+var(yb)) + 0.3*sqrt(mean(rg)^2+mean(yb)^2).
- ``border_uniformity`` — fraction of 1px-frame pixels within an L∞
  tolerance of the frame's median colour (solid borders / letterboxing /
  placeholder frames score ~1).
- ``edge_density`` — fraction of luma pixels whose forward-difference
  gradient magnitude exceeds a threshold (low on blanks, high on text
  screenshots/noise).

Float metrics are rounded half-even to 4 dp (``np.round``) so driver-hash
comparisons against the serial oracle are representation-stable, the same
convention as ``decode_image_features``'s mean_lum.

Reference parity note: the reference's crawler keeps every fetched image
unconditionally (spider.py:73-78 ``GetImage``); these gates are the
scale-path addition the task brief asks for on top (image payload axis).
"""

from __future__ import annotations

import numpy as np

_LUMA = np.array([0.299, 0.587, 0.114])


def _gray(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) float64 luma (BT.601 weights, same as
    imagecodec._resize_gray)."""
    return px.astype(np.float64) @ _LUMA


def _area_gray(px: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Area-average the luma plane onto a gh x gw grid (reduceat bins per
    axis, nearest-neighbour when the source axis is smaller — the
    imagecodec.resize_area convention)."""
    g = _gray(px)
    h, w = g.shape

    def _axis(m: np.ndarray, n: int, out: int, axis: int) -> np.ndarray:
        if n < out:
            idx = (np.arange(out) * n // out).clip(0, n - 1)
            return np.take(m, idx, axis=axis)
        bounds = (np.arange(out) * n) // out
        counts = np.diff(np.append(bounds, n))
        shape = [1, 1]
        shape[axis] = out
        return np.add.reduceat(m, bounds, axis=axis) / counts.reshape(shape)

    return _axis(_axis(g, h, gh, 0), w, gw, 1)


def _to_i64(bits: int) -> int:
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def ahash64(px: np.ndarray) -> int:
    """Average hash: 8x8 area-mean luma, bit = cell > grid mean. Bit
    (63 - (8*r + c)) carries cell (r, c), matching phash64's layout."""
    grid = _area_gray(px, 8, 8)
    mean = grid.mean()
    bits = 0
    for i, v in enumerate(grid.flatten()):
        if v > mean:
            bits |= 1 << (63 - i)
    return _to_i64(bits)


def dhash64(px: np.ndarray) -> int:
    """Difference hash: 8x9 luma grid, bit = cell[r, c] < cell[r, c+1]
    (horizontal gradient sign). Invariant to global brightness shifts."""
    grid = _area_gray(px, 8, 9)
    diff = grid[:, 1:] > grid[:, :-1]
    bits = 0
    for i, v in enumerate(diff.flatten()):
        if v:
            bits |= 1 << (63 - i)
    return _to_i64(bits)


def _haar_ll(m: np.ndarray, levels: int) -> np.ndarray:
    """LL band after ``levels`` 2D Haar analysis steps (each step averages
    2x2 blocks; the orthonormal 1/sqrt(2) gains cancel in the threshold
    comparison, so plain means keep the same bit pattern)."""
    for _ in range(levels):
        m = (m[0::2, 0::2] + m[1::2, 0::2] + m[0::2, 1::2] + m[1::2, 1::2]) / 4.0
    return m


def whash64(px: np.ndarray) -> int:
    """Wavelet hash (the ``imagehash`` whash algorithm): luma resampled to
    64x64, 3-level Haar LL (8x8), DC coefficient replaced by the band
    median (remove_max_haar_ll), bit = coefficient > band median."""
    base = _area_gray(px, 64, 64)
    ll = _haar_ll(base, 3)
    med0 = np.median(ll)
    ll = ll.copy()
    ll[0, 0] = med0  # suppress DC so it never dominates the threshold
    med = np.median(ll)
    bits = 0
    for i, v in enumerate(ll.flatten()):
        if v > med:
            bits |= 1 << (63 - i)
    return _to_i64(bits)


def laplacian_var(px: np.ndarray) -> float:
    """Variance of the 4-neighbour Laplacian of the luma plane (interior
    pixels only — no padding policy to argue about). Images with no
    interior (h or w < 3) score 0."""
    g = _gray(px)
    if g.shape[0] < 3 or g.shape[1] < 3:
        return 0.0
    lap = (
        g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]
        - 4.0 * g[1:-1, 1:-1]
    )
    return float(np.round(lap.var(), 4))


def gray_entropy(px: np.ndarray) -> float:
    """Shannon entropy (bits) of the 256-bin luma histogram; luma is
    rounded half-up to uint8 bins. 0 for flat images, 8 for a perfectly
    uniform histogram."""
    g = np.clip(np.floor(_gray(px) + 0.5), 0, 255).astype(np.int64)
    counts = np.bincount(g.ravel(), minlength=256).astype(np.float64)
    p = counts[counts > 0] / g.size
    return float(np.round(-(p * np.log2(p)).sum(), 4))


def colorfulness(px: np.ndarray) -> float:
    """Hasler & Süsstrunk colourfulness: opponent axes rg = R - G,
    yb = (R + G)/2 - B; score = sqrt(std_rg^2 + std_yb^2) +
    0.3 * sqrt(mean_rg^2 + mean_yb^2). 0 for any grayscale image."""
    f = px.astype(np.float64)
    rg = f[..., 0] - f[..., 1]
    yb = 0.5 * (f[..., 0] + f[..., 1]) - f[..., 2]
    std = np.sqrt(rg.var() + yb.var())
    mean = np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    return float(np.round(std + 0.3 * mean, 4))


def border_uniformity(px: np.ndarray, tol: int = 8) -> float:
    """Fraction of the 1px outer frame within L∞ ``tol`` of the frame's
    per-channel median colour. Solid borders (letterboxing, placeholder
    tiles, watermark frames) score 1.0; natural photos much lower."""
    h, w, _ = px.shape
    if h < 2 or w < 2:
        return 1.0
    frame = np.concatenate(
        [px[0, :, :], px[-1, :, :], px[1:-1, 0, :], px[1:-1, -1, :]], axis=0
    ).astype(np.float64)
    med = np.median(frame, axis=0)
    ok = (np.abs(frame - med) <= tol).all(axis=1)
    return float(np.round(ok.mean(), 4))


def edge_density(px: np.ndarray, thresh: float = 24.0) -> float:
    """Fraction of luma pixels whose forward-difference gradient magnitude
    (|dx| + |dy|, L1) exceeds ``thresh``. Differences are taken on the
    (h-1, w-1) interior so both axes exist at every counted pixel."""
    g = _gray(px)
    if g.shape[0] < 2 or g.shape[1] < 2:
        return 0.0
    dx = np.abs(g[:-1, 1:] - g[:-1, :-1])
    dy = np.abs(g[1:, :-1] - g[:-1, :-1])
    return float(np.round(((dx + dy) > thresh).mean(), 4))


def quality_features(px: np.ndarray) -> dict:
    """All scalar quality signals for one decoded image, in one pass."""
    return {
        "ahash": ahash64(px),
        "dhash": dhash64(px),
        "whash": whash64(px),
        "blur_var": laplacian_var(px),
        "entropy": gray_entropy(px),
        "colorfulness": colorfulness(px),
        "border_uniformity": border_uniformity(px),
        "edge_density": edge_density(px),
    }
