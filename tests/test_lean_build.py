"""Lean scene builds (build(lean=True)): megakernel tables only.

The lean mode exists for production ingest of multi-million-triangle
meshes (the 7.2M benchmark dragon): it skips the per-prim BVH and the
binned-wavefront tables (~half the build time at scale) while packing
bit-identical krn_* megakernel tiers. Fallback dispatch must fail
loudly, never mis-render."""
import dataclasses

import numpy as np
import pytest

from cpupathtrace_tpu.models.scenes import bench_dragon_scene


@pytest.fixture(scope="module")
def pair():
    full = bench_dragon_scene(dragon_tris=20000, accel="binned")
    lean = bench_dragon_scene(dragon_tris=20000, accel="binned", lean=True)
    return full, lean


def test_lean_krn_tables_bit_identical(pair):
    full, lean = pair
    assert lean.lean and not full.lean
    for f in ("krn_records", "krn_cl_bounds", "krn_sup_bounds",
              "krn_hyp_bounds", "krn_big_pair", "big_v0", "big_prim",
              "root_lo", "root_hi", "tri_v0", "emissive_cdf"):
        a = np.asarray(getattr(full, f))
        b = np.asarray(getattr(lean, f))
        assert np.array_equal(a, b), f
    assert lean.krn_cluster_size == full.krn_cluster_size
    assert lean.krn_cull_mode == full.krn_cull_mode
    assert lean.n_big == full.n_big


def test_lean_skips_heavy_tables(pair):
    full, lean = pair
    assert lean.bvh_lo.shape[0] == 1 < full.bvh_lo.shape[0]
    assert lean.trv_blocks.shape[0] == 1 < full.trv_blocks.shape[0]
    assert lean.blk_v0.shape[0] == 1 < full.blk_v0.shape[0]


def test_lean_megakernel_dispatchable(pair):
    from cpupathtrace_tpu.integrator.pallas_megakernel import (
        megakernel_supported,
    )

    _, lean = pair
    assert megakernel_supported(lean)


def test_lean_dispatches_kernel_traversal(pair):
    """Round 4: lean scenes are no longer wavefront-dead — scene_intersect
    routes them through the in-kernel tiered traversal (krn_intersect),
    matching the full build's binned intersector exactly."""
    import jax.numpy as jnp

    from cpupathtrace_tpu.ops.intersect import scene_intersect

    full, lean = pair
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)), jnp.float32)
    d = rng.normal(size=(64, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                    jnp.float32)
    t_l, p_l = scene_intersect(lean, o, d)
    t_f, p_f = scene_intersect(full, o, d)
    np.testing.assert_allclose(
        np.asarray(t_l), np.asarray(t_f), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_l), np.asarray(p_f))
    assert int((np.asarray(p_l) >= 0).sum()) > 10


def test_lean_rejects_non_binned():
    from cpupathtrace_tpu.scene.scene import SceneBuilder
    from cpupathtrace_tpu.scene.geometry import make_box

    b = SceneBuilder()
    m = b.add_material(diffuse=(1, 1, 1, 1))
    b.add_triangles(make_box((-1, -1, -1), (1, 1, 1)), m)
    with pytest.raises(ValueError, match="lean"):
        b.build(lean=True)


def test_lean_roundtrips_through_cache(pair, tmp_path):
    from cpupathtrace_tpu.scene.cache import load_scene, save_scene

    _, lean = pair
    p = tmp_path / "lean.npz"
    save_scene(lean, p)
    back = load_scene(p)
    assert back.lean is True
    for f in dataclasses.fields(lean):
        a, b = getattr(lean, f.name), getattr(back, f.name)
        if hasattr(a, "shape"):
            assert np.array_equal(np.asarray(a), np.asarray(b)), f.name
        else:
            assert a == b, f.name
