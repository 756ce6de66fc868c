"""Mega-only dragon frame profile (honors PTX_ABLATE / PTX_SKIP_TRAVERSE /
PTX_KRN_* env knobs set before launch). Usage:
    python benchmarks/profile_mega.py [max_depth ...]
"""
import dataclasses
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpupathtrace_tpu.core.config import RenderOptions
from cpupathtrace_tpu.models.scenes import bench_camera, bench_dragon_scene
from cpupathtrace_tpu.integrator.film import pixel_camera_coords
from cpupathtrace_tpu.camera.camera import shoot_rays
from cpupathtrace_tpu.integrator.pallas_megakernel import trace_megakernel

W = H = 128
SPP = int(os.environ.get("PTX_PROF_SPP", "16"))
TRIS = int(os.environ.get("PTX_PROF_TRIS", "200000"))

t0 = time.time()
scene = bench_dragon_scene(dragon_tris=TRIS, accel="binned")
camera = bench_camera()
print(f"# scene built {time.time()-t0:.1f}s", flush=True)

xg, yg = np.meshgrid(np.arange(W, dtype=np.float32),
                     np.arange(H, dtype=np.float32))
options = RenderOptions(W, H, SPP, SPP, epsilon=1e-3, max_depth=40)
x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
_order = os.environ.get("PTX_PROF_ORDER", "sample")
if _order == "pixel":
    # Pixel-major: the spp samples of one pixel are adjacent — a 1024-ray
    # block covers 64 consecutive pixels instead of 8 image rows.
    xs = jnp.repeat(jnp.asarray(x_cam), SPP)
    ys = jnp.repeat(jnp.asarray(y_cam), SPP)
elif _order == "morton":
    # Morton-tiled pixel-major: a 1024-ray block covers an 8x8 pixel TILE
    # x 16 samples — the tightest primary frustum per block.
    from cpupathtrace_tpu.integrator.film import morton_perm

    perm = morton_perm(xg.ravel(), yg.ravel())
    xs = jnp.repeat(jnp.asarray(x_cam)[perm], SPP)
    ys = jnp.repeat(jnp.asarray(y_cam)[perm], SPP)
else:
    xs = jnp.tile(jnp.asarray(x_cam), SPP)
    ys = jnp.tile(jnp.asarray(y_cam), SPP)
rays = shoot_rays(camera, xs, ys, 1.0 / W, 1.0 / H, jax.random.PRNGKey(0))

depths = [int(x) for x in sys.argv[1:]] or [40]
for md in depths:
    opts_d = dataclasses.replace(options, max_depth=md)

    # Reduce on-device: transferring the full [R,4] spectrum over the axon
    # tunnel costs ~130 ms (measured) and swamps the kernel time.
    @jax.jit
    def fn(r, o=opts_d):
        s, _ = trace_megakernel(scene, r, o, 7)
        return s[:, :3].mean()

    t0 = time.time()
    m = float(fn(rays))
    comp = time.time() - t0
    dt = 1e30
    for _ in range(3):
        t0 = time.time()
        m = float(fn(rays))
        dt = min(dt, time.time() - t0)
    print(f"# depth {md:3d} mega: {dt*1000:8.1f} ms "
          f"({W*H*SPP/dt/1e6:.3f} Mrays/s)  rgb {m:.5f}  "
          f"(compile {comp:.0f}s)", flush=True)
