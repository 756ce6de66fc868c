"""Full-scale (7.2M-tri) knob A/B sweep in ONE process.

The dev tunnel charges ~4 minutes to upload the 4.9 GB scene tables per
process start, which round 3 misread as 'compile time' (the real
full-scale Mosaic compile is ~12 s — measured via aot_compile_test.py).
This harness pays the upload once and then A/Bs kernel knobs by
monkeypatching module constants + jax.clear_caches() between variants.

Usage: python benchmarks/experiments/fullscale_ab.py [variant ...]
Variants: base nearconds noshadowconds hypvec queue8 buckets8 buckets1
          blockrows16 base2 (re-baseline to detect tunnel drift)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

os.environ.setdefault("PTX_KRN_MAX_TRIS", str(9 * 10**6))
os.environ.setdefault("PTX_KRN_CLUSTER", "128")

from cpupathtrace_tpu.camera.camera import shoot_rays  # noqa: E402
from cpupathtrace_tpu.core.config import RenderOptions  # noqa: E402
from cpupathtrace_tpu.integrator.film import pixel_camera_coords  # noqa: E402
from cpupathtrace_tpu.integrator import pallas_megakernel as mk  # noqa: E402
from cpupathtrace_tpu.integrator import sorted_wavefront as sw  # noqa: E402
from cpupathtrace_tpu.accel import kernel_traverse as kt  # noqa: E402
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

VARIANTS = {
    "base": {},
    "base2": {},
    "nearconds": {(mk, "_REC_CONDS"): "1"},
    "nonearconds": {(mk, "_REC_CONDS"): "0"},
    "noshadowconds": {(mk, "_REC_CONDS_SHADOW"): "0"},
    "bothconds": {(mk, "_REC_CONDS"): "1", (mk, "_REC_CONDS_SHADOW"): "1"},
    "hypvec": {(kt, "_HYP_VEC_PAGES"): 99},
    "queue8": {(kt, "REC_QUEUE"): 8, (sw, "REC_QUEUE"): 8,
               (mk, "REC_QUEUE"): 8},
    "buckets8": {(kt, "_N_BUCKETS"): 8},
    "buckets1": {(kt, "_N_BUCKETS"): 1},
    "blockrows16": {"env_PTX_KRN_BLOCK_ROWS": "16"},
    "halves": {(mk, "_REC_HALVES"): "1"},
    "halves_m5": {(mk, "_REC_HALVES"): "1", (sw, "_MORTON_BITS"): 5},
    "morton3": {(sw, "_MORTON_BITS"): 3},
    "morton5": {(sw, "_MORTON_BITS"): 5},
    "morton6": {(sw, "_MORTON_BITS"): 6},
    "shadowrev": {(kt, "_SHADOW_REVERSE"): True},
    "blockrows4": {"env_PTX_KRN_BLOCK_ROWS": "4"},
    "blockrows2": {"env_PTX_KRN_BLOCK_ROWS": "2"},
}


def main():
    names = sys.argv[1:] or ["base", "nearconds", "noshadowconds",
                             "hypvec", "base2"]
    t0 = time.time()
    key = build_cache_key("dragonfull", TRIS, "binned", "lean")
    scene, hit = cached_build(
        key,
        lambda: bench_dragon_scene(dragon_tris=TRIS, accel="binned",
                                   lean=True),
        CACHE,
    )
    print(f"# scene ready {time.time()-t0:.1f}s "
          f"(cache {'HIT' if hit else 'MISS'})", flush=True)

    camera = bench_camera()
    options = RenderOptions(W, H, SPP, SPP, epsilon=1e-3, max_depth=40)
    xg, yg = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
    rays = shoot_rays(camera, jnp.tile(jnp.asarray(x_cam), SPP),
                      jnp.tile(jnp.asarray(y_cam), SPP),
                      1.0 / W, 1.0 / H, jax.random.PRNGKey(0))
    # Materialize on device BEFORE timing anything (the upload).
    t0 = time.time()
    jax.block_until_ready(scene.krn_records)
    np.asarray(scene.root_lo)
    print(f"# device upload {time.time()-t0:.1f}s", flush=True)

    saved = {}
    for name in names:
        spec = VARIANTS[name]
        for k, v in spec.items():
            if isinstance(k, tuple):
                mod, attr = k
                saved.setdefault(k, getattr(mod, attr))
                setattr(mod, attr, v)
            else:
                env = k[4:]
                saved.setdefault(k, os.environ.get(env))
                os.environ[env] = v
        jax.clear_caches()
        fn = jax.jit(lambda s, r: sw.trace_megakernel_sorted(
            s, r, options, 7))
        try:
            t0 = time.time()
            out = fn(scene, rays)
            s = np.asarray(out[0])
            comp = time.time() - t0
            dt = 1e30
            for _ in range(3):
                t0 = time.time()
                out = fn(scene, rays)
                s = np.asarray(out[0])
                dt = min(dt, time.time() - t0)
            print(f"# {name:14s}: {dt*1000:7.1f} ms "
                  f"({W*H*SPP/dt/1e6:.3f} Mrays/s)  rgb {s[:, :3].mean():.5f}"
                  f"  (compile+first {comp:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"# {name:14s}: FAILED {type(e).__name__}: {e}",
                  flush=True)
        # restore
        for k, v in saved.items():
            if isinstance(k, tuple):
                setattr(k[0], k[1], v)
            else:
                env = k[4:]
                if v is None:
                    os.environ.pop(env, None)
                else:
                    os.environ[env] = v
        saved.clear()


if __name__ == "__main__":
    main()
