"""Megakernel tests (interpret mode on CPU — slow, statistical).

The Pallas megakernel runs the full estimator on-chip; these tests verify
statistical parity with the jnp wavefront (`trace`), which is itself
parity-tested against the C++ reference (test_parity.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpupathtrace_tpu.core.config import RenderOptions
from cpupathtrace_tpu.core.rays import Rays
from cpupathtrace_tpu.integrator.wavefront import trace
from tests.scenes_util import inward_box_scene


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = pltpu.InterpretParams()
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.zeros((n, 3))
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 0.2
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(o, jnp.asarray(d, jnp.float32))


@pytest.mark.slow
def test_megakernel_supported():
    from cpupathtrace_tpu.integrator.pallas_megakernel import megakernel_supported

    assert megakernel_supported(inward_box_scene())


@pytest.mark.slow
def test_megakernel_statistical_parity():
    from cpupathtrace_tpu.integrator.pallas_megakernel import trace_megakernel

    scene = inward_box_scene()
    rays = _rays(1024)
    opts = RenderOptions(8, 8, 1, 1, max_depth=3)
    sp_ref, coll_ref = trace(scene, rays, opts, jax.random.PRNGKey(0))
    sp_mk, coll_mk = trace_megakernel(scene, rays, opts, 1234)
    np.testing.assert_array_equal(np.asarray(coll_ref), np.asarray(coll_mk))
    a = float(np.asarray(sp_ref[:, :3]).mean())
    b = float(np.asarray(sp_mk[:, :3]).mean())
    assert abs(a - b) / max(a, b) < 0.15, (a, b)
    # Medians agree tighter (firefly-immune).
    ma = float(np.median(np.asarray(sp_ref[:, :3])))
    mb = float(np.median(np.asarray(sp_mk[:, :3])))
    assert abs(ma - mb) / max(ma, mb) < 0.15, (ma, mb)


@pytest.mark.slow
def test_megakernel_deterministic():
    from cpupathtrace_tpu.integrator.pallas_megakernel import trace_megakernel

    scene = inward_box_scene()
    rays = _rays(512)
    opts = RenderOptions(8, 8, 1, 1, max_depth=3)
    a, _ = trace_megakernel(scene, rays, opts, 7)
    b, _ = trace_megakernel(scene, rays, opts, 7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = trace_megakernel(scene, rays, opts, 8)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_megakernel_specular_parity():
    """Glass + mirror paths through the megakernel agree with the wavefront
    statistically (exercises Fresnel, TIR, Bernoulli choice, reflection,
    one-way handling, specular-NEE opt-out)."""
    from cpupathtrace_tpu.integrator.pallas_megakernel import (
        megakernel_supported, trace_megakernel,
    )
    from cpupathtrace_tpu.scene.scene import BSDF_GLASS, BSDF_MIRROR, SceneBuilder
    from cpupathtrace_tpu.scene.geometry import make_plane

    b = SceneBuilder()
    white = b.add_material(diffuse=(1, 1, 1, 1))
    light = b.add_material(diffuse=(1, 1, 1, 1), emission=(1, 1, 1, 1))
    glass = b.add_material(diffuse=(1, 1, 1, 1), ior=1.5, bsdf=BSDF_GLASS)
    mirror = b.add_material(specular=(1, 1, 1, 1), bsdf=BSDF_MIRROR)
    b.add_triangles(make_plane((1, -1, -1), (-1, -1, 1), True), white)
    b.add_triangles(make_plane((-1, 1, -1), (1, 1, 1), True), white)
    b.add_triangles(make_plane((-0.25, 0.99, -0.25), (0.25, 0.99, 0.25), True), light)
    b.add_triangles(make_plane((-1, -1, -1), (1, 1, -1), True), white)
    b.add_sphere((0.3, -0.4, 0.5), 0.3, glass)
    b.add_sphere((-0.4, -0.5, 0.4), 0.25, mirror)
    scene = b.build()
    assert megakernel_supported(scene)

    rays = _rays(1024, seed=3)
    opts = RenderOptions(8, 8, 1, 1, max_depth=4)
    sp_ref, coll_ref = trace(scene, rays, opts, jax.random.PRNGKey(0))
    sp_mk, coll_mk = trace_megakernel(scene, rays, opts, 77)
    np.testing.assert_array_equal(np.asarray(coll_ref), np.asarray(coll_mk))
    # The half-open scene leaves many rays unlit (median 0): compare the
    # mean over the collected lanes, which both estimators light.
    mask = np.asarray(coll_ref)
    a = float(np.asarray(sp_ref[:, :3])[mask].mean())
    m = float(np.asarray(sp_mk[:, :3])[mask].mean())
    assert a > 1e-4 and m > 1e-4, (a, m)
    assert abs(a - m) / max(a, m) < 0.3, (a, m)


@pytest.mark.slow
def test_sorted_wavefront(monkeypatch):
    """The sorted-wavefront driver (per-bounce coherence sort + single
    -bounce step kernel) in one pass:
      * exact coverage + statistical radiance vs the jnp wavefront (the
        C++-parity-tested ground truth; independent RNG streams) — the
        sorted-vs-while-loop-megakernel comparison runs on real hardware in
        `bench.py --verify`, and tracing that third Pallas program here
        would dominate the suite budget, and
      * BIT-exact agreement between sorted and unsorted runs — each ray's
        RNG stream rides its carried state, so the coherence sort must be
        transparent (cross-record exact-t ties are the only theoretical
        exception and do not occur on this scene)."""
    from cpupathtrace_tpu.camera.camera import shoot_rays
    from cpupathtrace_tpu.integrator import sorted_wavefront
    from cpupathtrace_tpu.integrator.film import pixel_camera_coords
    from cpupathtrace_tpu.integrator.sorted_wavefront import (
        trace_megakernel_sorted,
    )
    from cpupathtrace_tpu.models.scenes import bench_camera, bench_dragon_scene

    w = h = 16
    spp = 2  # 512 rays: the bit-exactness check is scale-free; the
    # statistical megakernel comparison gets a sqrt(2)-wider bound.
    scene = bench_dragon_scene(dragon_tris=1200, accel="binned")
    cam = bench_camera()
    opts = RenderOptions(w, h, spp, spp, epsilon=1e-3, max_depth=4)
    xg, yg = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    xc, yc = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
    rays = shoot_rays(
        cam,
        jnp.tile(jnp.asarray(xc), spp),
        jnp.tile(jnp.asarray(yc), spp),
        1.0 / w, 1.0 / h, jax.random.PRNGKey(0),
    )
    # Force the per-bounce sort ON: 512 test rays sit below the production
    # _SORT_MIN_ALIVE threshold, which would silently skip the fused-sort
    # glue this test exists to cover.
    monkeypatch.setattr(sorted_wavefront, "_SORT_MIN_ALIVE", 0)
    s_s, c_s = trace_megakernel_sorted(scene, rays, opts, 1234, sort=True)
    sorted_means = [float(np.asarray(s_s)[:, :3].mean())] + [
        float(np.asarray(
            trace_megakernel_sorted(scene, rays, opts, sd, sort=True)[0]
        )[:, :3].mean())
        for sd in (77, 901)
    ]
    monkeypatch.undo()
    s_u, _ = trace_megakernel_sorted(scene, rays, opts, 1234, sort=False)
    wf_means = [
        float(np.asarray(
            trace(scene, rays, opts, jax.random.PRNGKey(k))[0]
        )[:, :3].mean())
        for k in (4, 5, 6)
    ]
    _, c_m = trace(scene, rays, opts, jax.random.PRNGKey(4))

    assert np.array_equal(np.asarray(c_m), np.asarray(c_s))
    m1 = float(np.median(wf_means))
    m2 = float(np.median(sorted_means))
    # 512-ray means of a glass scene are heavy-tailed (~15% sd): medians
    # of 3 independent seeds per tracer bound the comparison noise enough
    # for a gross-divergence catch; the powered statistical check is
    # bench.py --verify's 8-seed median comparison on hardware.
    assert abs(m1 - m2) / max(m1, 1e-9) < 0.35, (wf_means, sorted_means)
    np.testing.assert_allclose(
        np.asarray(s_s), np.asarray(s_u), rtol=1e-5, atol=1e-7
    )


def test_permute_packed_bit_exact_and_matches_fused():
    """The packed-row-gather permutation must move every operand BIT
    EXACTLY (uint32 RNG states ride it bitcast to f32 — any arithmetic
    canonicalization would corrupt NaN-pattern payloads) and agree with
    the fused multi-operand sort on unique keys."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cpupathtrace_tpu.integrator.sorted_wavefront import _permute_packed

    rng = np.random.default_rng(5)
    n = 4096
    key = jnp.asarray(rng.permutation(n).astype(np.int32))  # unique keys
    # Adversarial payloads: all-ones (NaN pattern), signaling-NaN range,
    # denormals, zeros, random.
    u = rng.integers(0, 2**32, n, dtype=np.uint32)
    u[:64] = 0xFFFFFFFF
    u[64:128] = 0x7F800001  # sNaN pattern
    u[128:192] = 0x00000001  # denormal
    f = rng.normal(size=n).astype(np.float32)
    i = rng.integers(-(2**31), 2**31 - 1, n, dtype=np.int32)
    arrays = (jnp.asarray(u), jnp.asarray(f), jnp.asarray(i))

    fused = jax.lax.sort((key,) + arrays, num_keys=1, is_stable=False)
    from cpupathtrace_tpu.integrator.sorted_wavefront import _permute_wide

    for permute in (_permute_packed, _permute_wide):
        key_s, perm = jax.jit(permute)(key, arrays)
        np.testing.assert_array_equal(
            np.asarray(key_s), np.asarray(fused[0]), err_msg=permute.__name__
        )
        for a, b, dt in zip(perm, fused[1:], ("u32", "f32", "i32")):
            av, bv = np.asarray(a), np.asarray(b)
            # Compare raw bits: NaN != NaN under ==.
            np.testing.assert_array_equal(
                av.view(np.uint32), bv.view(np.uint32),
                err_msg=f"{permute.__name__} {dt}",
            )


@pytest.mark.slow
def test_diff_megakernel_record_replay(monkeypatch):
    """The differentiable record-and-replay path in interpret mode:
      * the record-emitting forward is BIT-identical to the unsorted
        single-bounce driver,
      * the reference replay reconstructs the kernel's radiance sums
        bit-for-bit and the fast replay agrees to f32 reassociation,
      * gradients flow and match a finite difference through the full
        custom_vjp (common random numbers, exact-roulette depth)."""
    import dataclasses

    from cpupathtrace_tpu.camera.camera import shoot_rays
    from cpupathtrace_tpu.integrator.diff_megakernel import (
        DIFF_FIELDS,
        em_material_ids,
        preprocess_records,
        replay_fast,
        replay_spectrum,
        trace_diff,
        trace_megakernel_diff,
    )
    from cpupathtrace_tpu.integrator.film import pixel_camera_coords
    from cpupathtrace_tpu.integrator.sorted_wavefront import (
        trace_megakernel_sorted,
    )
    from cpupathtrace_tpu.models.scenes import bench_box_scene, bench_camera

    scene = bench_box_scene()
    cam = bench_camera()
    w = h = 16
    spp = 2
    opts = RenderOptions(w, h, spp, spp, epsilon=1e-3, max_depth=4)
    xg, yg = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    xc, yc = pixel_camera_coords(opts, xg.ravel(), yg.ravel())
    rays = shoot_rays(
        cam, jnp.tile(jnp.asarray(xc, jnp.float32), spp),
        jnp.tile(jnp.asarray(yc, jnp.float32), spp),
        1.0 / w, 1.0 / h, jax.random.PRNGKey(0),
    )

    spec, coll, recs = trace_megakernel_diff(scene, rays, opts, 7)
    spec_u, _ = trace_megakernel_sorted(scene, rays, opts, 7, sort=False)
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(spec_u))

    mats = {f: getattr(scene, f) for f in DIFF_FIELDS}
    em_mid = em_material_ids(scene)
    ls = scene.light_spectrum[:, :3]
    em_k = int(scene.emissive_sample_count)
    ref = np.asarray(replay_spectrum(mats, recs, em_mid, ls, 0, em_k))
    np.testing.assert_array_equal(ref, np.asarray(spec)[:, :3])
    pre = preprocess_records(recs, em_mid, ls, int(scene.num_materials),
                             0, em_k)
    np.testing.assert_allclose(
        np.asarray(replay_fast(mats, pre)), ref, rtol=1e-3, atol=2e-3
    )

    # Gradient through the full custom_vjp vs central finite difference.
    def loss(m):
        s2 = dataclasses.replace(scene, **m)
        sp, _ = trace_diff(s2, rays, opts, 7)
        return jnp.mean(sp[:, :3])

    g = jax.grad(loss)(mats)
    eps = 2e-3
    idx = ("mat_diffuse", (1, 1))
    up = dict(mats)
    up[idx[0]] = up[idx[0]].at[idx[1]].add(eps)
    dn = dict(mats)
    dn[idx[0]] = dn[idx[0]].at[idx[1]].add(-eps)
    fd = (float(loss(up)) - float(loss(dn))) / (2 * eps)
    an = float(g[idx[0]][idx[1]])
    assert abs(an - fd) <= max(0.05 * abs(fd), 3e-4), (an, fd)
    assert float(jnp.abs(g["mat_emission"]).sum()) > 0.0
