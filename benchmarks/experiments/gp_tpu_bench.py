"""Geometry-parallel fast path on real TPU: per-shard in-kernel traversal
(krn_intersect) through shard_map vs the same intersector replicated.

One real chip = a 1-device gp mesh; the delta vs the unsharded program
measures the gp machinery's cost (stacked-table unstack + 2 pmins per
query) at hardware speed. Bit-identical results are asserted."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cpupathtrace_tpu.core.config import RenderOptions  # noqa: E402
from cpupathtrace_tpu.integrator.film import pixel_camera_coords  # noqa: E402
from cpupathtrace_tpu.models.scenes import bench_camera, bench_dragon_scene  # noqa: E402
from cpupathtrace_tpu.parallel.geometry import (  # noqa: E402
    make_gp_mesh,
    render_gp,
    shard_scene_kernel_geometry,
)

W = H = 64
SPP = 4
os.environ["PTX_WAVEFRONT_KRN"] = "1"  # replicated comparator uses the
# same in-kernel intersector the gp shards run

scene = bench_dragon_scene(dragon_tris=200000, accel="binned")
camera = bench_camera()
options = RenderOptions(W, H, SPP, SPP, epsilon=1e-3, max_depth=8)

t0 = time.time()
sc1 = shard_scene_kernel_geometry(scene, 1)
print(f"# gp shard prep {time.time()-t0:.1f}s", flush=True)

def run_gp():
    img = render_gp(sc1, camera, options,
                    make_gp_mesh(jax.devices()[:1]), seed=3)
    return np.asarray(img)

def run_plain():
    # Same wavefront + krn intersector, no shard_map/gp combine.
    from cpupathtrace_tpu.integrator.film import render_chunk

    xg, yg = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    x, y = pixel_camera_coords(options, xg.ravel(), yg.ravel())
    os.environ["PTX_NO_MEGAKERNEL"] = "1"
    s, c = render_chunk(scene, camera, options,
                        jnp.asarray(x, jnp.float32),
                        jnp.asarray(y, jnp.float32),
                        jax.random.PRNGKey(3), SPP)
    img = np.asarray(s / np.maximum(np.asarray(c), 1)[:, None])
    return img.reshape(H, W, 4)

for name, fn in (("gp=1 ", run_gp), ("plain", run_plain)):
    t0 = time.time()
    img = fn()
    comp = time.time() - t0
    dt = 1e30
    for _ in range(3):
        t0 = time.time()
        img = fn()
        dt = min(dt, time.time() - t0)
    print(f"# {name}: {dt*1000:8.1f} ms ({W*H*SPP/dt/1e6:.3f} Mrays/s) "
          f"rgb {img[..., :3].mean():.5f} alpha {img[..., 3].mean():.3f} "
          f"(compile+first {comp:.1f}s)", flush=True)
