"""BSDF unit tests: sampling distributions, Fresnel values, eval contracts
(ref: src/scene/propagation.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

from cpupathtrace_tpu.bsdf.bsdf import (
    RayMaterial,
    eval_spectrum,
    fresnel_reflectance,
    importance_sample_cosine,
    propagate,
)
from cpupathtrace_tpu.scene.scene import BSDF_GLASS, BSDF_LAMBERTIAN, BSDF_MIRROR
from cpupathtrace_tpu.utils.math import PI, dot, length, normalize


def _mat(n, bsdf=BSDF_LAMBERTIAN, ior=1.0, one_way=False, diffuse=(1, 1, 1, 1)):
    return RayMaterial(
        diffuse=jnp.tile(jnp.asarray(diffuse, jnp.float32), (n, 1)),
        specular=jnp.ones((n, 4)),
        ior=jnp.full((n,), ior),
        emission=jnp.zeros((n, 4)),
        bsdf=jnp.full((n,), bsdf, jnp.int32),
        one_way=jnp.full((n,), one_way, bool),
    )


def test_cosine_sampling_distribution():
    n = 1 << 14
    u = jax.random.uniform(jax.random.PRNGKey(0), (n, 2))
    vec, p = importance_sample_cosine(u[:, 0], u[:, 1], 1.0)
    v = np.asarray(vec)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    assert v[:, 2].min() >= 0.0  # upper hemisphere
    # pdf = 2 cos(theta) / 2pi = cos/pi; E[cos] under pdf = 2/3.
    np.testing.assert_allclose(np.asarray(p), 2.0 * v[:, 2] / (2.0 * np.pi), rtol=1e-5)
    np.testing.assert_allclose(v[:, 2].mean(), 2.0 / 3.0, atol=0.01)


def test_fresnel_normal_incidence():
    # R0 = ((n1-n2)/(n1+n2))^2: air->glass 1.5 gives 0.04.
    r, cos_t = fresnel_reflectance(jnp.array(1.0), jnp.array(1.0), jnp.array(1.5))
    np.testing.assert_allclose(float(r), 0.04, atol=1e-4)
    np.testing.assert_allclose(float(cos_t), 1.0, atol=1e-6)


def test_fresnel_grazing_reflects_fully():
    r, _ = fresnel_reflectance(jnp.array(1e-4), jnp.array(1.0), jnp.array(1.5))
    assert float(r) > 0.98


def test_fresnel_total_internal_reflection():
    # Glass->air beyond the critical angle (~41.8 deg): R=1, cos_t=0.
    cos_i = jnp.array(0.5)  # 60 deg > critical
    r, cos_t = fresnel_reflectance(cos_i, jnp.array(1.5), jnp.array(1.0))
    np.testing.assert_allclose(float(r), 1.0)
    np.testing.assert_allclose(float(cos_t), 0.0)


def test_lambertian_propagate_upper_hemisphere():
    n = 4096
    mat = _mat(n)
    normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    d = jnp.tile(normalize(jnp.array([[1.0, -1.0, 0.0]])), (n, 1))
    pos = jnp.zeros((n, 3))
    u = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    o2, d2, fac, pd = propagate(mat, d, pos, normal, 1e-3, u)
    dn = np.asarray(dot(d2, normal))
    assert dn.min() >= -1e-6  # all outgoing in the normal hemisphere
    np.testing.assert_allclose(np.asarray(fac), 1.0)
    np.testing.assert_allclose(np.asarray(length(d2)), 1.0, rtol=1e-5)
    # Offset epsilon along the new direction (ref: worker.cpp propagate use).
    np.testing.assert_allclose(np.asarray(o2), np.asarray(d2) * 1e-3, atol=1e-8)


def test_mirror_propagate_exact_reflection():
    n = 4
    mat = _mat(n, BSDF_MIRROR)
    normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    d = jnp.tile(normalize(jnp.array([[1.0, -1.0, 0.0]])), (n, 1))
    u = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
    _, d2, fac, pd = propagate(mat, d, jnp.zeros((n, 3)), normal, 1e-3, u)
    np.testing.assert_allclose(
        np.asarray(d2), np.tile(normalize(jnp.array([[1.0, 1.0, 0.0]])), (n, 1)), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(fac), 1.0)
    np.testing.assert_allclose(np.asarray(pd), 1.0)


def test_glass_propagate_splits_reflect_refract():
    n = 1 << 13
    mat = _mat(n, BSDF_GLASS, ior=1.5)
    normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    d = jnp.tile(normalize(jnp.array([[0.6, -0.8, 0.0]])), (n, 1))
    u = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))
    _, d2, fac, pd = propagate(mat, d, jnp.zeros((n, 3)), normal, 1e-3, u)
    up = np.asarray(dot(d2, normal)) > 0
    # Reflectance at cos=0.8 air->1.5 is a few percent: both branches occur,
    # mostly refraction.
    assert 0.001 < up.mean() < 0.2
    # Refracted rays bend toward the normal: |sin_t| = sin_i/1.5.
    refr = np.asarray(d2)[~up]
    sin_t = np.abs(refr[:, 0])
    np.testing.assert_allclose(sin_t, 0.6 / 1.5, atol=1e-5)
    # Snell consistency for pdfs: pd == rat for reflection, 1-rat otherwise,
    # and factor includes the eta^2 radiance scaling on refraction
    # (ref: propagation.cpp:155).
    fac = np.asarray(fac)
    np.testing.assert_allclose(fac[~up] / np.asarray(pd)[~up], 1.5**2, rtol=1e-5)


def test_eval_lambertian_cosine_over_pi():
    n = 3
    mat = _mat(n, diffuse=(0.5, 0.25, 1.0, 1.0))
    normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
    to_dir = jnp.stack(
        [
            jnp.array([0.0, 1.0, 0.0]),
            normalize(jnp.array([1.0, 1.0, 0.0])),
            jnp.array([0.0, -1.0, 0.0]),
        ]
    )
    from_dir = jnp.tile(normalize(jnp.array([[1.0, -1.0, 0.0]])), (n, 1))
    light = jnp.ones((n, 4))
    spec, shade, pd = eval_spectrum(mat, from_dir, to_dir, normal, light, synthetic=True)
    np.testing.assert_allclose(
        np.asarray(shade),
        [1.0 / np.pi, (np.sqrt(2) / 2) / np.pi, 0.0],
        rtol=1e-5,
        atol=1e-7,
    )
    np.testing.assert_allclose(np.asarray(spec[0]), [0.5, 0.25, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(pd), 1.0)


def test_specular_nee_pdf_zero():
    # Specular BSDFs opt out of NEE: synthetic pd = 0
    # (ref: propagation.cpp:173,214).
    for bsdf in (BSDF_GLASS, BSDF_MIRROR):
        mat = _mat(2, bsdf)
        normal = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (2, 1))
        d = jnp.tile(normalize(jnp.array([[1.0, -1.0, 0.0]])), (2, 1))
        _, _, pd_syn = eval_spectrum(mat, d, -d, normal, jnp.ones((2, 4)), synthetic=True)
        _, _, pd_smp = eval_spectrum(mat, d, -d, normal, jnp.ones((2, 4)), synthetic=False)
        np.testing.assert_allclose(np.asarray(pd_syn), 0.0)
        np.testing.assert_allclose(np.asarray(pd_smp), 1.0)
