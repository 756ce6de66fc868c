"""Profile: traversal visit counters on the dragon bench workload."""
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
SPP = 16

t0 = time.time()
scene = bench_dragon_scene(dragon_tris=200000, accel="binned")
camera = bench_camera()
options = RenderOptions(W, H, SPP, SPP, epsilon=1e-3, max_depth=40)
print(f"# scene built {time.time()-t0:.1f}s  n_super="
      f"{scene.krn_sup_bounds.shape[0]}", flush=True)

xg, yg = np.meshgrid(np.arange(W, dtype=np.float32),
                     np.arange(H, dtype=np.float32))
x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
xs = jnp.tile(jnp.asarray(x_cam, jnp.float32), SPP)
ys = jnp.tile(jnp.asarray(y_cam, jnp.float32), SPP)
key = jax.random.PRNGKey(0)
rays = shoot_rays(camera, xs, ys, 1.0 / W, 1.0 / H, key)

import sys

depths = [int(x) for x in sys.argv[1:]] or [options.max_depth]
prev = None
for md in depths:
    import dataclasses
    opts_d = dataclasses.replace(options, max_depth=md)
    fn = jax.jit(lambda r, o=opts_d: trace_megakernel(
        scene, r, o, 7, debug_visits=True))
    t0 = time.time()
    spectrum, coll, vis = fn(rays)
    vis = np.asarray(vis)
    compile_s = time.time() - t0
    dt = 1e30
    for _ in range(3):
        t0 = time.time()
        spectrum, coll, vis = fn(rays)
        vis = np.asarray(vis)
        spectrum = np.asarray(spectrum)
        dt = min(dt, time.time() - t0)
    n_blocks = vis.shape[0]
    tot = vis.sum(axis=0)
    marg = "" if prev is None else (
        f"  marginal n/s rec: {tot[1]-prev[1]} / {tot[3]-prev[3]}"
    )
    print(f"# depth {md:3d}: run {dt*1000:7.1f} ms "
          f"({W*H*SPP/dt/1e6:.3f} Mrays/s)  "
          f"nearest sup/rec {tot[0]}/{tot[1]}  "
          f"shadow sup/rec {tot[2]}/{tot[3]}{marg}  "
          f"(compile {compile_s:.0f}s)  rgb {spectrum[:, :3].mean():.5f}",
          flush=True)
    prev = tot
n_blocks = vis.shape[0]
print(f"# per-block rec visit quantiles (nearest): "
      f"{np.percentile(vis[:,1], [0,25,50,75,95,100]).astype(int)}")
print(f"# per-block rec visit quantiles (shadow) : "
      f"{np.percentile(vis[:,3], [0,25,50,75,95,100]).astype(int)}")
