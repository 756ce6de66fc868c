"""Benchmark: the reference's renderSceneBox workload on one TPU chip.

Replicates benchmark/main.cpp:34-57 (closed 2x2x2 box, 12 wall tris + 2
emissive ceiling tris, camera at (0,0,-3) aspect -1, 128x128 @ 256 spp
fixed) and reports throughput in the reference's items-processed convention:
width * height * spp primary samples per second (benchmark/main.cpp:30).

Baseline (vs_baseline denominator): the C++ reference compiled -O3 on this
machine's 4-core CPU renders this workload at 0.883 Mrays/s (best of 3,
measured 2026-08-16; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_CPU_MRAYS = 0.883

WIDTH = HEIGHT = 128
SPP = 256
SPP_CHUNK = 64  # launches of W*H*SPP_CHUNK rays; film accumulates


def main():
    # Persistent compilation cache: the remote-compiled executable is reused
    # across bench runs (first compile of the wavefront takes minutes).
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.integrator.film import pixel_camera_coords, render_chunk
    from cpupathtrace_tpu.models.scenes import bench_box_scene, bench_camera

    scene = bench_box_scene()
    camera = bench_camera()
    options = RenderOptions(
        WIDTH, HEIGHT, SPP, SPP, epsilon=1e-3, max_depth=40
    )

    xg, yg = np.meshgrid(
        np.arange(WIDTH, dtype=np.float32), np.arange(HEIGHT, dtype=np.float32)
    )
    x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
    x_cam = jnp.asarray(x_cam, jnp.float32)
    y_cam = jnp.asarray(y_cam, jnp.float32)

    def frame(seed):
        key = jax.random.PRNGKey(seed)
        total = jnp.zeros((WIDTH * HEIGHT, 4))
        count = jnp.zeros(WIDTH * HEIGHT, jnp.int32)
        for i, k in enumerate(jax.random.split(key, SPP // SPP_CHUNK)):
            s, c = render_chunk(
                scene, camera, options, x_cam, y_cam, k, SPP_CHUNK
            )
            total = total + s
            count = count + c
        return total, count

    # Warmup (compile). NB: sync via host transfer — block_until_ready has
    # been observed to return early on the axon-tunneled backend.
    t0 = time.time()
    total, count = frame(0)
    np.asarray(total)
    compile_s = time.time() - t0

    best = 1e30
    iters = 3
    for i in range(iters):
        t0 = time.time()
        total, count = frame(i + 1)
        np.asarray(total)
        dt = time.time() - t0
        best = min(best, dt)
        print(
            f"# iter {i}: {dt*1000:.1f} ms ({WIDTH*HEIGHT*SPP/dt/1e6:.2f} Mrays/s)",
            file=sys.stderr,
        )

    img = np.asarray(total) / np.maximum(np.asarray(count), 1)[:, None]
    mean_rgb = float(img[:, :3].mean())
    print(
        f"# compile {compile_s:.1f}s, mean rgb {mean_rgb:.5f}, "
        f"alpha {float(img[:, 3].mean()):.3f}",
        file=sys.stderr,
    )

    mrays = WIDTH * HEIGHT * SPP / best / 1e6
    print(
        json.dumps(
            {
                "metric": "renderSceneBox_throughput",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / REFERENCE_CPU_MRAYS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
