"""Inverse rendering demo: recover Cornell-box wall albedo and emitter
radiance from a target image by gradient descent — the differentiable
capability the C++ reference lacks entirely (BASELINE.json north-star
config[3]).

Usage: python examples/inverse_rendering.py [--steps N] [--spp N] [--cpu]
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=8)
    p.add_argument("--steps", type=int, default=80)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--max-depth", type=int, default=4)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cpupathtrace_tpu import RenderOptions, SceneBuilder, make_camera
    from cpupathtrace_tpu.diff import (
        get_material_params,
        inverse_render,
        render_image_diff,
    )
    from cpupathtrace_tpu.scene.geometry import make_plane

    # Ground-truth scene: white-walled box with an emissive ceiling panel
    # (demo-style inward windings).
    b = SceneBuilder()
    white = b.add_material(diffuse=(0.8, 0.6, 0.4, 1.0))  # truth to recover
    light = b.add_material(diffuse=(1, 1, 1, 1), emission=(1, 1, 1, 1))
    b.add_triangles(make_plane((1, -1, -1), (-1, -1, 1), True), white)
    b.add_triangles(make_plane((-1, 1, -1), (1, 1, 1), True), white)
    b.add_triangles(make_plane((-0.25, 0.99, -0.25), (0.25, 0.99, 0.25), True), light)
    b.add_triangles(make_plane((-1, -1, -1), (1, 1, -1), True), white)
    b.add_triangles(make_plane((-1, -1, -1), (-1, 1, 1), True), white)
    b.add_triangles(make_plane((1, -1, 1), (-1, 1, 1), True), white)
    b.add_triangles(make_plane((1, -1, 1), (1, 1, -1), True), white)
    scene = b.build()
    camera = make_camera((0, 0, 0), (0, 0, 0.9), (0, 1, 0))
    options = RenderOptions(args.size, args.size, 8, 8, max_depth=args.max_depth)

    truth = np.asarray(scene.mat_diffuse[1, :3])
    print(f"ground-truth wall albedo: {truth}", file=sys.stderr)

    target = render_image_diff(scene, camera, options, jax.random.PRNGKey(99), 32)
    target = jax.lax.stop_gradient(target)

    # Start from a wrong albedo; optimize only the diffuse table.
    params = get_material_params(scene)
    init = {"mat_diffuse": params["mat_diffuse"].at[1, :3].set(0.3)}
    print(f"initial guess:            {np.asarray(init['mat_diffuse'][1, :3])}",
          file=sys.stderr)

    def cb(i, loss, p):
        if i % 10 == 0:
            a = np.asarray(p["mat_diffuse"][1, :3])
            print(f"step {i:4d}  loss {loss:.6f}  albedo {a}", file=sys.stderr)

    recovered, losses = inverse_render(
        scene, camera, options, target, init,
        steps=args.steps, learning_rate=args.lr, spp=args.spp, callback=cb,
    )
    rec = np.asarray(recovered["mat_diffuse"][1, :3])
    err = np.abs(rec - truth).max()
    print(f"recovered albedo:         {rec}  (max abs error {err:.3f})",
          file=sys.stderr)
    print(f"loss: {losses[0]:.6f} -> {losses[-1]:.6f}", file=sys.stderr)
    return 0 if err < 0.25 else 1


if __name__ == "__main__":
    sys.exit(main())
