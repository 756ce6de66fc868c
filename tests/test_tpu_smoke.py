"""Hardware smoke tests: the Pallas paths on a REAL TPU chip.

The interpret-mode suite cannot catch Mosaic-only regressions (layouts,
DMA, the hardware PRNG path); `bench.py`'s default verify covers the
recorded benchmark run, and this file is the fast pytest-side gate —
`pytest -m tpu` on any machine with a chip attached. Auto-skipped
elsewhere (the CI suite pins the CPU backend).

Ref analog: the reference's whole test suite runs on its deployment
target by construction (test/render_test.cpp).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon")
    and "TPU" not in str(jax.devices()[0]).upper(),
    reason="no TPU attached",
)
pytestmark = [tpu, pytest.mark.tpu]


@pytest.fixture(scope="module")
def box_rays():
    from cpupathtrace_tpu.core.rays import Rays
    from cpupathtrace_tpu.models.scenes import bench_box_scene

    scene = bench_box_scene()
    rng = np.random.default_rng(0)
    m = 16384
    og = np.zeros((m, 3), np.float32)
    og[:, 2] = -2.9
    d = np.stack(
        [rng.uniform(-0.8, 0.8, m), rng.uniform(-0.8, 0.8, m), np.ones(m)],
        -1,
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return scene, Rays(origin=jnp.asarray(og), direction=jnp.asarray(d))


def test_megakernel_on_chip_estimator(box_rays):
    """While-loop megakernel on hardware: exact coverage of the closed
    box + a loose statistical radiance window (single-run means of this
    estimator are heavy-tailed; the tight median gate lives in
    bench.py --verify)."""
    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.integrator.pallas_megakernel import trace_megakernel

    scene, rays = box_rays
    opts = RenderOptions(64, 64, 16, 16, epsilon=1e-3, max_depth=12)
    s, coll = jax.jit(
        lambda r: trace_megakernel(scene, r, opts, 7)
    )(rays)
    s = np.asarray(s)
    coll = np.asarray(coll)
    # The shell origins sit outside the box, so only a (deterministic)
    # subset of directions enter; the cross-tracer mask identity is the
    # strong check (test below + bench.py --verify medians).
    frac = float(coll.mean())
    assert 0.2 < frac <= 1.0, f"collected fraction {frac}"
    assert np.isfinite(s).all()
    m = float(s[coll, :3].mean())
    assert 0.005 < m < 0.5, f"radiance mean {m} outside sanity window"


def test_binned_traversal_on_chip_exact():
    """Pallas binned traversal == the jnp sweep oracle on hardware,
    per-ray exact (the same gate bench.py --verify runs, smaller)."""
    from cpupathtrace_tpu.accel.pallas_traverse import (
        binned_intersect_ref,
        binned_intersect_tpu,
    )
    from cpupathtrace_tpu.models.scenes import bench_dragon_scene

    scene = bench_dragon_scene(dragon_tris=20000, accel="binned")
    rng = np.random.default_rng(1)
    n = 4096
    o = rng.uniform(-0.95, 0.95, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_k, p_k = map(np.asarray, jax.jit(
        lambda o, d: binned_intersect_tpu(scene, o, d))(o, d))
    t_r, p_r = map(np.asarray, jax.jit(
        lambda o, d: binned_intersect_ref(scene, o, d))(o, d))
    same = (p_k == p_r) | (t_k == t_r)
    assert bool(same.all()), f"{int((~same).sum())}/{n} rays disagree"
    assert int((p_k >= 0).sum()) > 1000


def test_sorted_driver_on_chip_matches_megakernel_coverage(box_rays):
    """Sorted driver on hardware: collected masks identical to the
    while-loop megakernel for the same seed (coverage of a closed scene
    is deterministic per tracer)."""
    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.integrator.pallas_megakernel import trace_megakernel
    from cpupathtrace_tpu.integrator.sorted_wavefront import (
        trace_megakernel_sorted,
    )

    scene, rays = box_rays
    opts = RenderOptions(64, 64, 16, 16, epsilon=1e-3, max_depth=12)
    s_m, _ = jax.jit(lambda r: trace_megakernel(scene, r, opts, 1234))(rays)
    s_s, _ = jax.jit(
        lambda r: trace_megakernel_sorted(scene, r, opts, 1234)
    )(rays)
    np.testing.assert_array_equal(
        np.asarray(s_s)[:, 3], np.asarray(s_m)[:, 3]
    )


def test_diff_megakernel_matches_sorted_driver(box_rays):
    """The record-emitting diff forward is BIT-identical to the
    established single-bounce driver (same kernel body, same seeding)."""
    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.integrator.diff_megakernel import (
        trace_megakernel_diff,
    )
    from cpupathtrace_tpu.integrator.sorted_wavefront import (
        trace_megakernel_sorted,
    )

    scene, rays = box_rays
    opts = RenderOptions(32, 32, 8, 8, epsilon=1e-3, max_depth=6)
    a = np.asarray(jax.jit(
        lambda r: trace_megakernel_diff(scene, r, opts, 7)[0]
    )(rays))
    b = np.asarray(jax.jit(
        lambda r: trace_megakernel_sorted(scene, r, opts, 7, sort=False)[0]
    )(rays))
    np.testing.assert_array_equal(a, b)


def test_diff_megakernel_replay_bit_exact(box_rays):
    """The reference replay reconstructs the kernel's radiance sums
    bit-for-bit from the records; the fast (matmul-shaped) replay agrees
    to f32 reassociation."""
    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.integrator.diff_megakernel import (
        DIFF_FIELDS,
        em_material_ids,
        preprocess_records,
        replay_fast,
        replay_spectrum,
        trace_megakernel_diff,
    )

    scene, rays = box_rays
    opts = RenderOptions(32, 32, 8, 8, epsilon=1e-3, max_depth=8)
    spec, _, recs = jax.jit(
        lambda r: trace_megakernel_diff(scene, r, opts, 11)
    )(rays)
    mats = {f: getattr(scene, f) for f in DIFF_FIELDS}
    em_mid = em_material_ids(scene)
    ls = scene.light_spectrum[:, :3]
    em_k = int(scene.emissive_sample_count)
    ref = np.asarray(replay_spectrum(mats, recs, em_mid, ls, 0, em_k))
    np.testing.assert_array_equal(ref, np.asarray(spec)[:, :3])
    pre = preprocess_records(recs, em_mid, ls, int(scene.num_materials),
                             0, em_k)
    fast = np.asarray(replay_fast(mats, pre))
    np.testing.assert_allclose(fast, ref, rtol=1e-3, atol=2e-3)


def test_diff_megakernel_fd_gradients_64(box_rays):
    """FD-vs-analytic gradients at 64x64 through the TPU diff path
    (render_chunk differentiable=True dispatches to the record-and-replay
    megakernel on hardware). max_depth 4 = the exact-roulette regime."""
    from cpupathtrace_tpu.core.config import RenderOptions
    from cpupathtrace_tpu.diff.render import (
        apply_material_params,
        finite_difference_grad,
        get_material_params,
        loss_and_grad,
        render_image_diff,
    )
    from cpupathtrace_tpu.models.scenes import bench_camera

    scene, _ = box_rays
    camera = bench_camera()
    opts = RenderOptions(64, 64, 8, 8, epsilon=1e-3, max_depth=4)
    params = get_material_params(scene)
    key = jax.random.PRNGKey(3)
    target = jax.lax.stop_gradient(render_image_diff(
        apply_material_params(
            scene, {k: v * 0.9 for k, v in params.items()}
        ),
        camera, opts, jax.random.PRNGKey(9), 8,
    ))
    _, g = loss_and_grad(params, scene, camera, opts, target, key, 8)
    checked = 0
    for field, idx in (
        ("mat_diffuse", (1, 2)),
        ("mat_emission", (1, 1)),
        ("mat_specular", (0, 0)),
    ):
        fd = finite_difference_grad(
            params, scene, camera, opts, target, key, 8, field, idx,
            eps=2e-3,
        )
        an = float(g[field][idx])
        assert abs(an - fd) <= max(0.05 * abs(fd), 3e-4), (field, idx, an, fd)
        checked += 1
    assert checked == 3
