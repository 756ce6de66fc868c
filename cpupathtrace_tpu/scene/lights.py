"""Next-event-estimation light sampling.

Vectorized rebuild of Scene::sampleLights (ref: src/scene/scene.cpp:222-289):
all explicit point lights plus `emissive_sample_count` CDF-drawn emissive
primitive samples per shading point. The per-scene sample count
`min(2 + log10(E+1), E)` (ref: scene.cpp:226) is static, so the output is a
fixed-size [R, L+K] light batch — shadow rays become one more regular
wavefront op instead of a data-dependent list.

Invalid samples (zero-cosine, coincident points, culled backfaces — the
`continue`s at ref scene.cpp:266-277) are masked out with `valid=False`,
which contributes exactly 0, equivalent to the reference skipping the entry.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bsdf.bsdf import gather_material
from ..ops.surface import sample_prim_surface, surface_normal
from ..scene.scene import SceneData
from ..utils.math import dot, length_squared, normalize


class LightSamples(NamedTuple):
    target: jnp.ndarray  # [R, NL, 3] sampled light position
    spectrum: jnp.ndarray  # [R, NL, 4] emitted spectrum toward the shading point
    pd: jnp.ndarray  # [R, NL] probability density (solid-angle-converted)
    valid: jnp.ndarray  # [R, NL] bool


def num_light_samples(scene: SceneData) -> int:
    return scene.n_point_lights + scene.emissive_sample_count


def sample_lights(scene: SceneData, pos: jnp.ndarray, key) -> LightSamples:
    """pos: [R,3]. Returns fixed-size light sample batch [R, L+K]."""
    r = pos.shape[0]
    parts_target, parts_spec, parts_pd, parts_valid = [], [], [], []

    # --- Explicit point lights: delta lights, pdf 1 (ref: light.cpp:33-41).
    if scene.n_point_lights > 0:
        lp = scene.light_pos[: scene.n_point_lights]
        ls = scene.light_spectrum[: scene.n_point_lights]
        parts_target.append(jnp.broadcast_to(lp[None], (r,) + lp.shape))
        parts_spec.append(jnp.broadcast_to(ls[None], (r,) + ls.shape))
        parts_pd.append(jnp.ones((r, scene.n_point_lights)))
        parts_valid.append(jnp.ones((r, scene.n_point_lights), bool))

    # --- Emissive primitives via CDF binary search (ref: scene.cpp:238-287).
    k = scene.emissive_sample_count
    if k > 0:
        u = jax.random.uniform(key, (r, k, 3))
        rsel = u[..., 0]
        idx = jnp.searchsorted(scene.emissive_cdf, rsel, side="left")
        idx = jnp.clip(idx, 0, scene.emissive_cdf.shape[0] - 1)
        cdf_hi = scene.emissive_cdf[idx]
        cdf_lo = jnp.where(idx > 0, scene.emissive_cdf[jnp.maximum(idx - 1, 0)], 0.0)
        selection_p = (cdf_hi - cdf_lo) * float(k)

        prim = scene.emissive_prim[idx]
        spos, surface_p, cull = sample_prim_surface(scene, prim, u[..., 1], u[..., 2])
        snorm = surface_normal(scene, prim, spos)

        to_light = spos - pos[:, None, :]
        dist2 = length_squared(to_light)
        ldir = normalize(to_light)
        abs_dot = jnp.abs(dot(-ldir, snorm))

        valid = (abs_dot > 0.0) & (dist2 > 0.0)
        valid = valid & jnp.where(cull, dot(ldir, snorm) < 0.0, True)

        # Area-measure -> solid-angle-measure conversion |d|^2 / |cos|
        # (ref: scene.cpp:280).
        conversion = dist2 / jnp.maximum(abs_dot, 1e-30)
        mat = gather_material(scene, prim)
        pd = selection_p * surface_p * conversion

        parts_target.append(spos)
        parts_spec.append(mat.emission)
        parts_pd.append(pd)
        parts_valid.append(valid)

    if not parts_target:
        return LightSamples(
            target=jnp.zeros((r, 0, 3)),
            spectrum=jnp.zeros((r, 0, 4)),
            pd=jnp.zeros((r, 0)),
            valid=jnp.zeros((r, 0), bool),
        )

    return LightSamples(
        target=jnp.concatenate(parts_target, axis=1),
        spectrum=jnp.concatenate(parts_spec, axis=1),
        pd=jnp.concatenate(parts_pd, axis=1),
        valid=jnp.concatenate(parts_valid, axis=1),
    )
