"""Scaling-efficiency harness: SPMD render throughput vs mesh size.

Measures the sharded render path (parallel/render.py) at dp = 1/2/4/8 on
the virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8)
and reports parallel efficiency relative to dp=1 — the TPU-native analog of
the reference's worker-pool scaling (ref: src/worker.cpp:364-387), checked
against BASELINE.md's >=80% multi-host target.

NB: virtual CPU devices share this host's physical cores, so measured
efficiency is capped by core count; the harness reports `host_cores` so the
ceiling is explicit. On a real multi-chip slice each dp shard owns a chip
and the same program scales by hardware.

Writes EFFICIENCY.json at the repo root and prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.integrator.film import pixel_camera_coords
    from cpupathtrace_tpu.models.scenes import bench_box_scene, bench_camera
    from cpupathtrace_tpu.parallel.mesh import make_render_mesh
    from cpupathtrace_tpu.parallel.render import render_chunk_sharded

    scene = bench_box_scene()
    camera = bench_camera()
    size = 64
    spp = 16
    options = RenderOptions(size, size, spp, spp, epsilon=1e-3, max_depth=12)

    xg, yg = np.meshgrid(
        np.arange(size, dtype=np.float32), np.arange(size, dtype=np.float32)
    )
    x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
    x_cam = jnp.asarray(x_cam, jnp.float32)
    y_cam = jnp.asarray(y_cam, jnp.float32)

    devices = jax.devices()
    results = {}
    for dp in (1, 2, 4, 8):
        if dp > len(devices):
            break
        mesh = make_render_mesh(devices[:dp], sample_axis=1)
        key = jax.random.PRNGKey(0)

        def run():
            s, c = render_chunk_sharded(
                scene, camera, options, mesh, x_cam, y_cam, key, spp
            )
            np.asarray(s)

        run()  # compile
        best = 1e30
        for _ in range(3):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        mrays = size * size * spp / best / 1e6
        results[dp] = mrays
        print(f"# dp={dp}: {best*1e3:8.1f} ms  {mrays:6.3f} Mrays/s",
              file=sys.stderr, flush=True)

    base = results[1]
    efficiency = {
        str(dp): round(v / (base * dp), 3) for dp, v in results.items()
    }
    out = {
        "metric": "scaling_efficiency_dp",
        "throughput_mrays": {str(k): round(v, 3) for k, v in results.items()},
        "efficiency_vs_dp1": efficiency,
        "host_cores": os.cpu_count(),
        "note": "virtual CPU mesh; efficiency capped by shared host cores",
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "EFFICIENCY.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
