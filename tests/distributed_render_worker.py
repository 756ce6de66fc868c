"""Worker for the 2-process multi-host render test (test_distributed.py).

Runs as an independent process: initializes the jax.distributed runtime,
renders this host's row block of a fixed scene (the multi-host tile
assignment of parallel/distributed.py), gathers every host's rows over the
cross-process collective, and writes the full image (process 0 only).
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    n = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cpupathtrace_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", n, pid)
    assert jax.process_count() == n, jax.process_count()
    assert len(jax.devices()) == n * 4, jax.devices()

    import numpy as np
    import jax.numpy as jnp

    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.integrator.film import (
        pixel_camera_coords,
        render_chunk,
    )
    from cpupathtrace_tpu.models.scenes import bench_box_scene, bench_camera

    w, h, spp = 16, 13, 4  # odd height: exercises the padded gather
    scene = bench_box_scene()
    camera = bench_camera()
    options = RenderOptions(w, h, spp, spp, epsilon=1e-3, max_depth=6)

    lo, hi = distributed.host_local_rows(h)
    xg, yg = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(lo, hi, dtype=np.float32)
    )
    x_cam, y_cam = pixel_camera_coords(options, xg.ravel(), yg.ravel())
    key = jax.random.fold_in(jax.random.PRNGKey(7), pid)
    s, c = render_chunk(
        scene, camera, options, jnp.asarray(x_cam, jnp.float32),
        jnp.asarray(y_cam, jnp.float32), key, spp,
    )
    local = (np.asarray(s) / np.maximum(np.asarray(c), 1)[:, None]).reshape(
        hi - lo, w, 4
    )

    full = distributed.gather_image(local, h)
    assert full.shape == (h, w, 4), full.shape

    # Global-mesh SPMD collective across the two processes (the pod
    # programming model): a (dp, sp) mesh over all 8 global devices, a
    # process-local-data global array, and a psum over both axes.
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = distributed.global_render_mesh()
    assert mesh.devices.size == n * 4, mesh
    sharding = NamedSharding(mesh, P(("dp", "sp")))
    local_vals = np.arange(4, dtype=np.float32) + 4.0 * pid
    garr = jax.make_array_from_process_local_data(sharding, local_vals, (8,))
    total = jax.jit(
        shard_map(
            lambda x: jax.lax.psum(jnp.sum(x), ("dp", "sp")),
            mesh=mesh, in_specs=P(("dp", "sp")), out_specs=P(),
        )
    )(garr)
    # Every process must see sum(0..7) = 28 from the cross-process psum.
    assert float(np.asarray(total)) == 28.0, total

    if pid == 0:
        np.save(out_path, full)


if __name__ == "__main__":
    main()
