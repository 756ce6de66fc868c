"""Cluster-major Pallas compute stage (accel/pallas_binned.py): exactness vs
the dense intersector in interpret mode. Hardware-validated bit-exact vs
sweep on the 200k-tri dragon (BASELINE.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpupathtrace_tpu.ops.intersect import dense_intersect
from cpupathtrace_tpu.scene.scene import SceneBuilder
from cpupathtrace_tpu.scene.geometry import HostTriangle


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = pltpu.InterpretParams()
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


def _scene(accel, cluster_size=32, n=300, seed=11):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    tris = []
    for c in rng.uniform(-2, 2, (n, 3)):
        v = c + rng.uniform(-0.3, 0.3, (3, 3))
        tris.append(HostTriangle(v[0], v[1], v[2]))
    b.add_triangles(tris, 0)
    b.add_sphere((0.0, 0.0, 0.0), 0.4)
    return b.build(accel=accel, cluster_size=cluster_size)


@pytest.mark.slow
def test_cluster_major_kernel_matches_dense():
    from cpupathtrace_tpu.accel.pallas_binned import binned_intersect_pallas

    sc = _scene("sweep")
    sd = _scene("dense")
    rng = np.random.default_rng(12)
    o = jnp.asarray(rng.uniform(-4, 4, (256, 3)), jnp.float32)
    d = rng.normal(size=(256, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    tp, pp = binned_intersect_pallas(sc, o, d, max_candidates=4)
    td, pd = dense_intersect(sd, o, d)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(td), rtol=1e-4, atol=1e-5)
    assert (np.asarray(pp) != np.asarray(pd)).mean() < 0.02
