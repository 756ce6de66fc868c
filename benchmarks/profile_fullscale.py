"""Profile: the FULL-SCALE (7.2M-triangle) dragon-box frame.

Loads the cached lean dragonfull build (same key as bench.py), runs the
sorted-wavefront driver, and prints frame time plus per-bounce traversal
visit counters (nearest/shadow supercluster descends and record visits)
so the frame budget model in docs/DESIGN_large_scenes.md stays tied to
measurements. Usage:

    python benchmarks/profile_fullscale.py [--visits] [--depth N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

os.environ.setdefault("PTX_KRN_MAX_TRIS", str(9 * 10**6))
os.environ.setdefault("PTX_KRN_CLUSTER", "128")

from cpupathtrace_tpu.camera.camera import shoot_rays  # noqa: E402
from cpupathtrace_tpu.core.config import RenderOptions  # noqa: E402
from cpupathtrace_tpu.integrator.film import pixel_camera_coords  # noqa: E402
from cpupathtrace_tpu.integrator.sorted_wavefront import (  # noqa: E402
    trace_megakernel_sorted,
)
from cpupathtrace_tpu.models.scenes import (  # noqa: E402
    bench_camera,
    bench_dragon_scene,
)
from cpupathtrace_tpu.scene.cache import build_cache_key, cached_build  # noqa: E402

W = H = 128
SPP = 16
TRIS = 7_200_000
CACHE = os.environ.get(
    "PTX_SCENE_CACHE", os.path.expanduser("~/.cache/cpupathtrace_tpu")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--visits", action="store_true",
                    help="per-bounce visit counters (separate compile)")
    ap.add_argument("--depth", type=int, default=40)
    args = ap.parse_args()

    t0 = time.time()
    key = build_cache_key("dragonfull", TRIS, "binned", "lean")
    scene, hit = cached_build(
        key,
        lambda: bench_dragon_scene(dragon_tris=TRIS, accel="binned",
                                   lean=True),
        CACHE,
    )
    print(f"# scene ready {time.time()-t0:.1f}s (cache "
          f"{'HIT' if hit else 'MISS'}) S={scene.krn_cl_bounds.shape[0]}",
          flush=True)

    camera = bench_camera()
    options = RenderOptions(W, H, SPP, SPP, epsilon=1e-3,
                            max_depth=args.depth)
    xg, yg = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
    rays = shoot_rays(camera, jnp.tile(jnp.asarray(x_cam), SPP),
                      jnp.tile(jnp.asarray(y_cam), SPP),
                      1.0 / W, 1.0 / H, jax.random.PRNGKey(0))

    # Pass the scene as a jit ARGUMENT: closing over it captures the
    # multi-GB tables as lowering constants (XLA embeds + hashes them —
    # measured to stall compilation for tens of minutes at 4.9 GB).
    fn = jax.jit(lambda s, r: trace_megakernel_sorted(
        s, r, options, 7, debug_visits=args.visits))
    t0 = time.time()
    out = fn(scene, rays)
    s = np.asarray(out[0])
    print(f"# compile+run {time.time()-t0:.1f}s", flush=True)
    dt = 1e30
    for _ in range(3):
        t0 = time.time()
        out = fn(scene, rays)
        s = np.asarray(out[0])
        dt = min(dt, time.time() - t0)
    print(f"# frame {dt*1000:.1f} ms ({W*H*SPP/dt/1e6:.3f} Mrays/s)  "
          f"rgb {s[:, :3].mean():.5f}", flush=True)

    if args.visits:
        vis = np.asarray(out[2])  # [depth, n_blocks, 4]
        tot = vis.sum(axis=1)
        print("# depth  near_sup near_rec shad_sup shad_rec")
        for d in range(vis.shape[0]):
            if tot[d].sum() == 0:
                continue
            print(f"# {d:5d}  {tot[d, 0]:8d} {tot[d, 1]:8d} "
                  f"{tot[d, 2]:8d} {tot[d, 3]:8d}")
        g = tot.sum(axis=0)
        print(f"# TOTAL  {g[0]:8d} {g[1]:8d} {g[2]:8d} {g[3]:8d}")


if __name__ == "__main__":
    main()
