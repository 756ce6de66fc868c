"""SPMD sharded rendering over a (dp, sp) device mesh.

TPU-native replacement for the reference's thread-pool scheduler
(ref: src/worker.cpp:328-414 doWorkParallel/processJob): the image's pixel
axis is sharded over `dp` (each shard is the analog of a work-queue tile),
samples-per-pixel are sharded over `sp`, and the per-pixel sample sums are
reduced with a `psum` over `sp` — the collective that replaces the
reference's shared output image + mutex.

RNG parity with the reference's forked per-thread engines
(ref: worker.cpp:369-382): every (dp, sp) shard folds its mesh coordinates
into the base key, so results are deterministic for a fixed mesh shape and
seed, and differ per shard.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera.camera import Camera, shoot_rays
from ..core.config import RenderOptions
from ..integrator.film import pixel_camera_coords
from ..integrator.wavefront import trace
from ..scene.scene import SceneData


def _trace_shard(scene, camera, options, spp_local, differentiable, x, y, key):
    """Per-shard body: trace `spp_local` samples for this pixel shard and
    psum-accumulate over the sample-parallel axis."""
    dp_i = jax.lax.axis_index("dp")
    sp_i = jax.lax.axis_index("sp")
    key = jax.random.fold_in(jax.random.fold_in(key, dp_i), sp_i)

    p = x.shape[0]
    xs = jnp.tile(x, spp_local)
    ys = jnp.tile(y, spp_local)
    k_cam, k_trace = jax.random.split(key)
    rays = shoot_rays(
        camera, xs, ys,
        1.0 / options.image_width, 1.0 / options.image_height, k_cam,
    )
    # Same dispatch as the single-chip path: forward traces on TPU use the
    # Pallas megakernel per shard when the scene fits its dense tables.
    from ..integrator.film import _dispatch_trace

    spectrum, collected = _dispatch_trace(
        scene, rays, options, k_trace, differentiable
    )
    spectrum = spectrum.reshape(spp_local, p, 4)
    collected = collected.reshape(spp_local, p)
    s = jnp.sum(jnp.where(collected[..., None], spectrum, 0.0), axis=0)
    c = jnp.sum(collected.astype(jnp.int32), axis=0)
    # Reduce partial sample sums across the sample-parallel axis (ICI).
    s = jax.lax.psum(s, "sp")
    c = jax.lax.psum(c, "sp")
    return s, c


@partial(
    jax.jit,
    static_argnames=("options", "mesh", "spp", "differentiable"),
)
def render_chunk_sharded(
    scene: SceneData,
    camera: Camera,
    options: RenderOptions,
    mesh: Mesh,
    x_cam: jnp.ndarray,  # [P] padded to a multiple of mesh dp size
    y_cam: jnp.ndarray,
    key,
    spp: int,
    differentiable: bool = False,
):
    """Sharded render of P pixels at `spp` samples; returns (sum [P,4],
    collected [P]) fully replicated."""
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    if x_cam.shape[0] % dp != 0:
        raise ValueError(f"pixel count {x_cam.shape[0]} not divisible by dp={dp}")
    if spp % sp != 0:
        raise ValueError(f"spp {spp} not divisible by sp={sp}")

    fn = jax.shard_map(
        partial(_trace_shard, scene, camera, options, spp // sp, differentiable),
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P()),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    return fn(x_cam, y_cam, key)


def render_sharded(
    scene: SceneData,
    camera: Camera,
    options: RenderOptions,
    mesh: Mesh,
    seed: int = 0,
    spp: int | None = None,
) -> np.ndarray:
    """Full-frame fixed-spp SPMD render; returns [H, W, 4] float32.

    The distributed analog of `render()` for parity/benchmark configs
    (fixed sample counts). Pixels are padded to the dp axis, sample sums are
    psum'd over sp, and the mean image is gathered to the host.
    """
    w, h = options.image_width, options.image_height
    spp = spp if spp is not None else options.max_sample_count
    dp = mesh.shape["dp"]

    px = np.arange(w, dtype=np.float32)
    py = np.arange(h, dtype=np.float32)
    xg, yg = np.meshgrid(px, py)
    x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())

    n = x_cam.size
    pad = (-n) % dp
    if pad:
        x_cam = np.concatenate([x_cam, np.zeros(pad, np.float32)])
        y_cam = np.concatenate([y_cam, np.zeros(pad, np.float32)])

    key = jax.random.PRNGKey(seed)
    s, c = render_chunk_sharded(
        scene, camera, options, mesh,
        jnp.asarray(x_cam, jnp.float32), jnp.asarray(y_cam, jnp.float32),
        key, spp,
    )
    s = np.asarray(s)[:n]
    c = np.asarray(c)[:n]
    img = s / np.maximum(c, 1)[:, None]
    img = np.where(c[:, None] > 0, img, 0.0).astype(np.float32)
    return img.reshape(h, w, 4)
