"""Tests for the bin-by-cluster traversal machinery (round-2 scaffolding,
docs/DESIGN_large_scenes.md): exactness of candidate generation + resolve,
and the sort-based binning layer."""
import jax
import jax.numpy as jnp
import numpy as np

from cpupathtrace_tpu.accel.binned import (
    bin_candidates,
    binned_intersect,
    generate_candidates,
)
from cpupathtrace_tpu.ops.intersect import dense_intersect
from cpupathtrace_tpu.scene.scene import SceneBuilder
from cpupathtrace_tpu.scene.geometry import HostTriangle


def _scene(accel, n=300, seed=11, cluster_size=32):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    tris = []
    for c in rng.uniform(-2, 2, (n, 3)):
        v = c + rng.uniform(-0.3, 0.3, (3, 3))
        tris.append(HostTriangle(v[0], v[1], v[2]))
    b.add_triangles(tris, 0)
    b.add_sphere((0.0, 0.0, 0.0), 0.4)
    return b.build(accel=accel, cluster_size=cluster_size)


def _rays(n=512, seed=12):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    return o, d


def test_binned_matches_dense():
    sc = _scene("sweep")
    sd = _scene("dense")
    o, d = _rays()
    tb, pb = binned_intersect(sc, o, d, max_candidates=4)
    td, pd = dense_intersect(sd, o, d)
    np.testing.assert_allclose(np.asarray(tb), np.asarray(td), rtol=1e-4, atol=1e-5)
    assert (np.asarray(pb) != np.asarray(pd)).mean() < 0.02


def test_binned_exact_with_tiny_candidate_budget():
    """Even max_candidates=1 stays exact via the residual round."""
    sc = _scene("sweep")
    sd = _scene("dense")
    o, d = _rays(seed=13)
    tb, _ = binned_intersect(sc, o, d, max_candidates=1)
    td, _ = dense_intersect(sd, o, d)
    np.testing.assert_allclose(np.asarray(tb), np.asarray(td), rtol=1e-4, atol=1e-5)


def test_generate_candidates_ordering():
    sc = _scene("sweep")
    o, d = _rays(64)
    ids, entry = generate_candidates(sc, o, d, 6)
    e = np.asarray(entry)
    # Nearest-first ordering within each ray; padding is +inf at the end
    # (replace inf with a finite sentinel so diff avoids inf-inf = NaN).
    e_f = np.where(np.isfinite(e), e, 1e30)
    assert np.all(np.diff(e_f, axis=1) >= -1e-5)
    assert np.all((np.asarray(ids) >= 0) == np.isfinite(e))


def test_bin_candidates_layout():
    sc = _scene("sweep")
    o, d = _rays(128)
    ids, _ = generate_candidates(sc, o, d, 4)
    c = sc.blk_prim.shape[0]
    order, sorted_key, counts = bin_candidates(ids, c)
    sk = np.asarray(sorted_key)
    # Sorted ascending, empties (key == C) at the end.
    assert np.all(np.diff(sk) >= 0)
    n_real = int((np.asarray(ids) >= 0).sum())
    assert int(np.asarray(counts).sum()) == n_real
    # The order permutation maps back onto the flat candidate list.
    flat = np.asarray(ids).reshape(-1)
    key_check = np.where(flat >= 0, flat, c)[np.asarray(order)]
    np.testing.assert_array_equal(key_check, sk)
