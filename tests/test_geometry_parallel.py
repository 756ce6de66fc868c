"""Geometry-parallel (primitive-sharded) intersection and rendering on the
8-virtual-device CPU mesh — the TP/EP analog for scenes whose intersection
tables exceed one chip's HBM (no reference analog: the reference shares one
Scene across its pthread pool, src/worker.cpp:364-387)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cpupathtrace_tpu import RenderOptions
from cpupathtrace_tpu.models.scenes import bench_camera, bench_dragon_scene
from cpupathtrace_tpu.ops.intersect import scene_intersect
from cpupathtrace_tpu.parallel.geometry import (
    gp_in_specs,
    make_gp_mesh,
    render_gp,
    shard_scene_geometry,
)


@pytest.fixture(scope="module")
def setup(cpu_devices):
    scene = bench_dragon_scene(dragon_tris=2000, accel="sweep")
    cam = bench_camera()
    opts = RenderOptions(12, 12, 4, 4, epsilon=1e-3, max_depth=6)
    return scene, cam, opts


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_gp_intersect_exact(setup, cpu_devices):
    """Sharded nearest-hit == unsharded nearest-hit, bit-exact: per-shard
    sweeps are exact over their cluster subset and the pmin combine takes
    the global min (ties broken toward the smaller prim id — the dragon's
    generic triangles produce none)."""
    scene, _, _ = setup
    mesh = make_gp_mesh(cpu_devices[:4])
    sc = shard_scene_geometry(scene, 4)
    o, d = _random_rays(512)

    fn = jax.shard_map(
        lambda s, o, d: scene_intersect(s, o, d),
        mesh=mesh,
        in_specs=(gp_in_specs(sc), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    t_gp, p_gp = jax.jit(fn)(sc, o, d)
    t_ref, p_ref = jax.jit(
        lambda o, d: scene_intersect(scene, o, d)
    )(o, d)
    np.testing.assert_array_equal(np.asarray(t_gp), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(p_gp), np.asarray(p_ref))
    assert int((np.asarray(p_gp) >= 0).sum()) > 100  # the query hits things


def test_gp_render_shard_invariant(setup, cpu_devices):
    """The full wavefront render is bit-identical on 1-way and 4-way
    geometry shardings: the combined hits are identical, so the replicated
    estimator draws identical sample streams."""
    scene, cam, opts = setup
    img1 = render_gp(scene, cam, opts, make_gp_mesh(cpu_devices[:1]), seed=3)
    img4 = render_gp(scene, cam, opts, make_gp_mesh(cpu_devices[:4]), seed=3)
    assert img1.shape == (12, 12, 4)
    np.testing.assert_array_equal(img1, img4)
    assert img1[..., 3].mean() == 1.0  # closed box: every sample collected
    assert img1[..., :3].mean() > 0.005


def test_gp_rejects_binned_scene(cpu_devices):
    scene = bench_dragon_scene(dragon_tris=2000, accel="binned")
    with pytest.raises(ValueError, match="big-triangle partition"):
        shard_scene_geometry(scene, 4)


def test_gp_cluster_padding(setup, cpu_devices):
    """Cluster counts not divisible by the axis are padded with void
    clusters (blk_prim = -1, inverted bounds)."""
    scene, _, _ = setup
    c = scene.blk_lo.shape[0]
    n = 7 if c % 7 else 5
    sc = shard_scene_geometry(scene, n)
    assert sc.blk_lo.shape[0] % n == 0
    assert sc.gp_axis == "gp"
    pad = sc.blk_prim[c:]
    assert bool((pad < 0).all())


# ---------------------------------------------------------------------------
# Fast path: the in-kernel traversal sharded over superclusters
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def krn_setup(cpu_devices):
    scene = bench_dragon_scene(dragon_tris=2000, accel="binned")
    cam = bench_camera()
    opts = RenderOptions(12, 12, 4, 4, epsilon=1e-3, max_depth=6)
    return scene, cam, opts


def test_krn_intersect_matches_oracle(krn_setup):
    """The standalone kernel-traversal intersector (interpret mode off-TPU)
    == the jnp binned oracle, bit-exact, including shadow-ray semantics."""
    from cpupathtrace_tpu.accel.pallas_traverse import (
        binned_intersect_ref,
        krn_intersect,
    )

    scene, _, _ = krn_setup
    o, d = _random_rays(512)
    t_k, p_k = jax.jit(lambda o, d: krn_intersect(
        scene, o, d, interpret=True))(o, d)
    t_r, p_r = jax.jit(lambda o, d: binned_intersect_ref(scene, o, d))(o, d)
    # The kernel's Plucker factorization matches the sweep's classic MT
    # to ~1e-7 relative (accel/kernel_traverse.py module doc) — prim ids
    # agree exactly on this generic scene, t to tolerance.
    np.testing.assert_allclose(
        np.asarray(t_k), np.asarray(t_r), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p_k), np.asarray(p_r))
    assert int((np.asarray(p_k) >= 0).sum()) > 100

    lim = jnp.full(o.shape[0], 1.2, jnp.float32)
    occ_k, pk2 = jax.jit(lambda o, d: krn_intersect(
        scene, o, d, t_max=lim, any_hit=True, interpret=True))(o, d)
    occ_r, pr2 = jax.jit(lambda o, d: binned_intersect_ref(
        scene, o, d, t_max=lim, any_hit=True))(o, d)
    np.testing.assert_array_equal(np.asarray(pk2) >= 0, np.asarray(pr2) >= 0)


def test_gp_krn_intersect_exact(krn_setup, cpu_devices):
    """Kernel-table sharding: per-shard in-kernel traversal + pmin combine
    == the UNSHARDED in-kernel traversal, bit-exact (each (record, ray)
    pair computes identical values on every shard; pruning order affects
    only speed, and the generic scene has no exact-t cross-record ties)."""
    from cpupathtrace_tpu.accel.pallas_traverse import krn_intersect
    from cpupathtrace_tpu.parallel.geometry import (
        shard_scene_kernel_geometry,
    )

    scene, _, _ = krn_setup
    mesh = make_gp_mesh(cpu_devices[:4])
    sc = shard_scene_kernel_geometry(scene, 4)
    assert sc.krn_records.ndim == 4 and sc.krn_records.shape[0] == 4
    o, d = _random_rays(512)

    fn = jax.shard_map(
        lambda s, o, d: scene_intersect(s, o, d),
        mesh=mesh,
        in_specs=(gp_in_specs(sc), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    t_gp, p_gp = jax.jit(fn)(sc, o, d)
    t_ref, p_ref = jax.jit(lambda o, d: krn_intersect(
        scene, o, d, interpret=True))(o, d)
    np.testing.assert_array_equal(np.asarray(t_gp), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(p_gp), np.asarray(p_ref))
    assert int((np.asarray(p_gp) >= 0).sum()) > 100


def test_gp_krn_render_shard_invariant(krn_setup, cpu_devices):
    """Full wavefront render through the kernel-sharded fast path is
    bit-identical on 1-way and 2-way shardings."""
    from cpupathtrace_tpu.parallel.geometry import (
        render_gp,
        shard_scene_kernel_geometry,
    )

    scene, cam, opts = krn_setup
    sc1 = shard_scene_kernel_geometry(scene, 1)
    sc2 = shard_scene_kernel_geometry(scene, 2)
    img1 = render_gp(sc1, cam, opts, make_gp_mesh(cpu_devices[:1]), seed=3)
    img2 = render_gp(sc2, cam, opts, make_gp_mesh(cpu_devices[:2]), seed=3)
    np.testing.assert_array_equal(img1, img2)
    assert img1[..., 3].mean() == 1.0
    assert img1[..., :3].mean() > 0.005
