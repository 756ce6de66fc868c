"""Post-processing: global tone mapping + gamma correction.

Pure-jnp rebuild of the reference operators (ref: src/post_processing.cpp):
  * tone_map — histogram-equalization-style remap: per-pixel brightness
    heuristic a*((r+g+b)/3 + max(r,g,b))/2, full sort of the brightness
    values (the reference bucket-sorts then merges — same result), 1024
    gaussian-weighted output segments, piecewise-linear remap
    (ref: post_processing.cpp:32-162)
  * gamma_correct — scales RGB by brightness^(1/gamma - 1), default 1.8
    (ref: post_processing.cpp:165-177)
  * post_process = gamma_correct(tone_map(img)) (ref: :179-182)

The reference's segment-ceiling construction is a sequential 1024-step loop
with carried `missed_contribution`; here it is a `lax.scan` — same recurrence,
compiler-friendly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .utils.math import PI

_FLT_MIN = 1.1754943508222875e-38
_SEGMENTS = 1024


def _brightness(img):
    """max(r,g,b) (ref: post_processing.cpp:22-24)."""
    return jnp.max(img[..., :3], axis=-1)


def _brightness_heuristic(img):
    """a * ((r+g+b)/3 + max(r,g,b)) / 2 (ref: post_processing.cpp:27-30)."""
    mean = jnp.mean(img[..., :3], axis=-1)
    return img[..., 3] * (mean + _brightness(img)) / 2.0


def _gaussian(t, mu, sigma):
    fac = 1.0 / jnp.sqrt(2.0 * PI)
    e = (t - mu) / sigma
    return fac * jnp.exp(-(e * e) / 2.0) / sigma


@jax.jit
def tone_map(image: jnp.ndarray) -> jnp.ndarray:
    """image: [H, W, 4] -> tone-mapped [H, W, 4] (alpha untouched)."""
    h, w = image.shape[0], image.shape[1]
    pixel_count = h * w
    flat = image.reshape(pixel_count, 4)

    bh = _brightness_heuristic(flat)
    min_b = jnp.minimum(0.0, jnp.min(bh))
    max_b = jnp.maximum(1e-4, jnp.max(bh))

    sorted_b = jnp.sort(bh)

    n_seg = min(_SEGMENTS, pixel_count)
    x = (jnp.arange(n_seg) + 0.5) / n_seg
    x = 2.0 * (x - 0.5)
    seg_w = 0.1 + _gaussian(x, 0.0, 0.3)
    total_w = jnp.sum(seg_w)

    # Segment ceilings with carried missed contribution
    # (ref: post_processing.cpp:105-128), as a scan.
    def step(carry, wi):
        prev_index, missed, prev_ceiling = carry
        items = jnp.round(wi * pixel_count / total_w + missed).astype(jnp.int32)
        has = items > 0
        b_idx = jnp.minimum(prev_index + items - 1, pixel_count - 1)
        ceiling = jnp.where(has, sorted_b[jnp.maximum(b_idx, 0)], prev_ceiling)
        prev_index = jnp.where(has, prev_index + items, prev_index)
        missed = jnp.where(has, 0.0, missed + wi * pixel_count / total_w)
        return (prev_index, missed, ceiling), ceiling

    init = (jnp.int32(0), jnp.float32(0.0), min_b)
    _, ceilings = jax.lax.scan(step, init, seg_w[: n_seg - 1])
    ceilings = jnp.concatenate([ceilings, jnp.array([max_b])])

    # Per-pixel piecewise-linear remap (ref: post_processing.cpp:130-162).
    b = jnp.maximum(_brightness(flat), _FLT_MIN)
    bh_px = _brightness_heuristic(flat)
    seg_idx = jnp.clip(jnp.searchsorted(ceilings, bh_px, side="left"), 0, n_seg - 1)
    upper = ceilings[seg_idx]
    lower = jnp.where(seg_idx > 0, ceilings[jnp.maximum(seg_idx - 1, 0)], min_b)
    span = jnp.maximum(upper - lower, _FLT_MIN)
    seg_val = (bh_px - lower) / span
    mapped = (seg_idx + seg_val) / n_seg
    factor = mapped / b

    rgb = flat[..., :3] * factor[:, None]
    out = jnp.concatenate([rgb, flat[..., 3:4]], axis=-1)
    return out.reshape(h, w, 4)


@partial(jax.jit, static_argnames=("gamma",))
def gamma_correct(image: jnp.ndarray, gamma: float = 1.8) -> jnp.ndarray:
    """Scale RGB by brightness^(1/gamma - 1) (ref: post_processing.cpp:165-177)."""
    # Clamp away exact zeros: 0^(negative exponent) would give inf and then
    # 0*inf = NaN on fully black pixels (the reference exhibits the same NaN
    # for black input; clamping keeps black pixels black instead).
    b = jnp.maximum(_brightness(image), _FLT_MIN)
    factor = jnp.power(b, 1.0 / gamma - 1.0)
    rgb = image[..., :3] * factor[..., None]
    return jnp.concatenate([rgb, image[..., 3:]], axis=-1)


def post_process(image: jnp.ndarray, gamma: float = 1.8) -> jnp.ndarray:
    """tone_map then gamma_correct (ref: post_processing.cpp:179-182)."""
    return gamma_correct(tone_map(image), gamma)
