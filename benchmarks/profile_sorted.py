"""Hardware A/B: sorted-wavefront driver vs the while-loop megakernel on
the dragon bench workload. Usage: python benchmarks/profile_sorted.py [depths...]"""
import dataclasses
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
from cpupathtrace_tpu.integrator.sorted_wavefront import trace_megakernel_sorted

W = H = 128
SPP = 16

t0 = time.time()
scene = bench_dragon_scene(dragon_tris=200000, accel="binned")
camera = bench_camera()
print(f"# scene built {time.time()-t0:.1f}s", flush=True)

xg, yg = np.meshgrid(np.arange(W, dtype=np.float32),
                     np.arange(H, dtype=np.float32))
options = RenderOptions(W, H, SPP, SPP, epsilon=1e-3, max_depth=40)
x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
rays = shoot_rays(camera, jnp.tile(jnp.asarray(x_cam), SPP),
                  jnp.tile(jnp.asarray(y_cam), SPP),
                  1.0 / W, 1.0 / H, jax.random.PRNGKey(0))

depths = [int(x) for x in sys.argv[1:]] or [7]
for md in depths:
    opts_d = dataclasses.replace(options, max_depth=md)
    for name, tracer in [("sorted", trace_megakernel_sorted),
                         ("mega  ", trace_megakernel)]:
        fn = jax.jit(lambda r, t=tracer, o=opts_d: t(scene, r, o, 7))
        t0 = time.time()
        s, _ = fn(rays); s = np.asarray(s)
        comp = time.time() - t0
        dt = 1e30
        for _ in range(3):
            t0 = time.time()
            s, _ = fn(rays); s = np.asarray(s)
            dt = min(dt, time.time() - t0)
        print(f"# depth {md:3d} {name}: {dt*1000:8.1f} ms "
              f"({W*H*SPP/dt/1e6:.3f} Mrays/s)  rgb {s[:, :3].mean():.5f}  "
              f"(compile {comp:.0f}s)", flush=True)
