"""Differentiable rendering at TPU speed: record-and-replay megakernel.

The estimator (ref: src/worker.cpp:26-146) under detached sampling has a
special structure: every pdf/roulette/geometry factor is a detached
scalar, and the only θ-dependence (θ = the material tables
mat_diffuse/mat_specular/mat_emission) is through per-vertex COLOR
products. Concretely, with S_v = the running spectrum product at vertex v
(S_0 = 1, S_{v+1} = C_v(θ) ⊙ S_v for a per-bounce material color C_v):

    out = Σ_v  S_v ⊙ emission[mid_v](θ) · W_v                (emission)
        + Σ_v Σ_l S_v ⊙ diffuse[mid_v](θ) ⊙ E_l(θ) · w_{v,l}   (NEE)

where W_v, w_{v,l} are detached scalars, C_v is diffuse / specular / 1
selected by the BSDF branch taken, and E_l is the sampled light's
spectrum (mat_emission of the emissive prim's material, or a constant
point-light spectrum).

So the FORWARD runs fully on-chip (the single-bounce Pallas megakernel,
per-bounce launches) while RECORDING, per (ray, bounce), just the
discrete/detached quantities: [mid, W, chain-selector] + w per point
light + (CDF row, w) per emissive draw — n_diff_records() f32 planes. The
BACKWARD then differentiates a trivial jnp REPLAY of the two sums above —
no traversal, no sampling, no BSDF logic — via `jax.custom_vjp`. Gradient
cost ≈ one fused scan over the records instead of a full re-trace.

Exactness: the replay reproduces the kernel's radiance sums term by term
(same records, same detached weights), so analytic gradients match finite
differences of the on-chip forward under common random numbers up to f32
reassociation — the same FD contract as the jnp wavefront path
(diff/render.py), now at megakernel speed. The roulette-threshold caveat
of diff/render.py (detached roulette pdf vs FD threshold crossings past
depth 4) applies unchanged.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import RenderOptions
from ..scene.scene import SceneData
from .pallas_megakernel import (
    N_STATE,
    _KRN_BLOCK_ROWS,
    _LANES,
    _pack_tables,
    megakernel_supported,
    n_diff_records,
)
from .sorted_wavefront import _bounce_call, _seed_rng_flat

#: The differentiable scene leaves (mirrors diff/render.py).
DIFF_FIELDS = ("mat_diffuse", "mat_specular", "mat_emission")


def diff_supported(scene: SceneData) -> bool:
    """The record-and-replay path rides the single-bounce megakernel."""
    return megakernel_supported(scene) and not os.environ.get("PTX_ABLATE")


def em_material_ids(scene: SceneData) -> jnp.ndarray:
    """[n_em] material id of each packed emissive row (the replay's
    CDF-row -> mat_emission mapping; same resolution as _pack_tables)."""
    prim = scene.emissive_prim
    is_sph = prim >= scene.n_tri
    ti = jnp.clip(prim, 0, scene.tri_v0.shape[0] - 1)
    si = jnp.clip(prim - scene.n_tri, 0, scene.sph_center.shape[0] - 1)
    return jnp.where(
        is_sph, scene.sph_material[si], scene.tri_material[ti]
    )


def trace_megakernel_diff(
    scene: SceneData,
    rays,
    options: RenderOptions,
    seed,
):
    """Forward on-chip trace that also returns the replay records.

    Returns (spectrum [R,4] with alpha = collected, collected [R] bool,
    records [max_depth, R, n_drec] f32). Same estimator as
    trace_megakernel_sorted(sort=False) — per-bounce kernel launches over
    externally carried state, unpermuted ray order.
    """
    tables = _pack_tables(scene)
    if scene.has_kernel_records:
        if scene.big_v0.shape[0] > scene.krn_big_pair.shape[0]:
            raise ValueError("diff megakernel: big partition exceeds pair record")
        n_super = int(scene.krn_cl_bounds.shape[0])
        n_tri_tbl = int(scene.big_v0.shape[0])
        block_rows = int(os.environ.get("PTX_KRN_BLOCK_ROWS", _KRN_BLOCK_ROWS))
        tables = tables + (
            scene.krn_sup_bounds, scene.krn_hyp_bounds,
            scene.krn_cl_bounds, scene.krn_records, scene.krn_big_pair,
        )
    else:
        n_super = 0
        n_tri_tbl = int(scene.tri_v0.shape[0])
        block_rows = _KRN_BLOCK_ROWS
        z = jnp.zeros((1,), jnp.float32)
        tables = tables + (z, z, z, z, scene.krn_big_pair)
    dense_pair = (not scene.has_kernel_records) and (
        scene.krn_big_pair.shape[0] > 1
    )

    o = jnp.asarray(rays.origin, jnp.float32)
    d = jnp.asarray(rays.direction, jnp.float32)
    r = o.shape[0]
    block = block_rows * _LANES
    pad = (-r) % block
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))]
        )
    rp = r + pad
    rows = rp // _LANES

    n_lights = int(scene.n_point_lights)
    em_k = int(scene.emissive_sample_count)
    n_drec = n_diff_records(n_lights, em_k)
    statics = dict(
        n_tri=n_tri_tbl, n_sph=int(scene.sph_center.shape[0]),
        n_mat=int(scene.num_materials), n_lights=n_lights,
        n_em=int(scene.n_emissive), em_k=em_k,
        epsilon=float(options.epsilon), n_super=n_super,
        block_rows=block_rows, dense_pair=dense_pair,
        cull_mode=int(scene.krn_cull_mode),
        big_cull_mode=int(scene.krn_big_cull_mode),
        diff_records=True,
    )
    max_depth = int(options.max_depth)
    seed_i = jnp.asarray(seed, jnp.int32)

    ones = jnp.ones(rp, jnp.float32)
    zeros = jnp.zeros(rp, jnp.float32)
    alive0 = jnp.concatenate(
        [jnp.ones(r, jnp.float32), jnp.zeros(pad, jnp.float32)]
    )
    state = (
        _seed_rng_flat(seed_i, jnp.arange(rp, dtype=jnp.int32)),
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        ones, ones, ones, zeros, zeros, zeros,
        ones, ones, ones, zeros, alive0,
    )
    # Skipped (all-dead) depths keep the init encoding: mid = -1, every
    # weight 0, chain-sel 0 = no contribution in the replay.
    recs0 = jnp.zeros((max_depth, rp, n_drec), jnp.float32)
    recs0 = recs0.at[:, :, 0].set(-1.0)

    def cond(c):
        depth, st, recs = c
        return (depth < max_depth) & (jnp.max(st[17]) > 0.5)

    def step(c):
        depth, st, recs = c
        st2d = tuple(a.reshape(rows, _LANES) for a in st)
        out = _bounce_call(
            tables, jnp.stack([seed_i, depth]), st2d, **statics
        )
        st = tuple(a.reshape(-1) for a in out[:N_STATE])
        plane = jnp.stack(
            [a.reshape(-1) for a in out[N_STATE:]], axis=-1
        )  # [rp, n_drec]
        recs = jax.lax.dynamic_update_slice(recs, plane[None], (depth, 0, 0))
        return depth + 1, st, recs

    _, st, recs = jax.lax.while_loop(
        cond, step, (jnp.int32(0), state, recs0)
    )
    coll = st[16][:r] > 0.5
    spectrum = jnp.stack(
        [st[10][:r], st[11][:r], st[12][:r], coll.astype(jnp.float32)],
        axis=-1,
    )
    return spectrum, coll, recs[:, :r]


def replay_spectrum(mats, recs, em_mid, light_spec, n_lights, em_k):
    """Differentiable replay of the record stream -> RGB sums [R, 3].

    Reproduces the kernel's emission + NEE accumulation exactly (the
    module docstring's two sums); all sampling decisions and detached
    weights live inside `recs`.
    """
    dif = mats["mat_diffuse"][:, :3]
    spc = mats["mat_specular"][:, :3]
    emi = mats["mat_emission"][:, :3]
    n_mat = dif.shape[0]
    n_em = em_mid.shape[0]
    n_rays = recs.shape[1]

    def step(carry, plane):
        s, out = carry
        mid = jnp.clip(plane[:, 0].astype(jnp.int32), 0, n_mat - 1)
        w_emis = plane[:, 1]
        sel = plane[:, 2].astype(jnp.int32)
        d_m = dif[mid]
        out = out + s * emi[mid] * w_emis[:, None]
        col = 3
        for li in range(n_lights):
            w = plane[:, col]
            col += 1
            out = out + s * d_m * light_spec[li][None, :] * w[:, None]
        for _ in range(em_k):
            row = jnp.clip(plane[:, col].astype(jnp.int32), 0, n_em - 1)
            w = plane[:, col + 1]
            col += 2
            out = out + s * d_m * emi[em_mid[row]] * w[:, None]
        c = jnp.where(
            (sel == 1)[:, None], d_m,
            jnp.where((sel == 2)[:, None], spc[mid], jnp.ones_like(d_m)),
        )
        s = jnp.where((sel > 0)[:, None], c * s, s)
        return (s, out), None

    carry0 = (
        jnp.ones((n_rays, 3), jnp.float32),
        jnp.zeros((n_rays, 3), jnp.float32),
    )
    (_, out), _ = jax.lax.scan(step, carry0, recs)
    return out


def preprocess_records(recs, em_mid, light_spec, n_mat, n_lights, em_k):
    """One detached pass turning the raw record planes into gather-free
    tensors for the fast replay:

      * oh   [D,R,M] — hit-material one-hot (zero row on miss)
      * W    [D,R]   — emission weight
      * sel1/2/3 [D,R] — chain-advance masks (diffuse/specular/ones)
      * em_b [D,R,M] — Σ_k onehot(material of CDF row_k) * w_k; the NEE
        emissive term becomes diffuse ⊙ (em_b @ mat_emission)
      * pl   [D,R,3] — Σ_li light_spec[li] * w_li (constant point-light
        spectra folded in)

    The raw-gather replay (`replay_spectrum`) stays as the bit-exact
    reference; this form trades exact kernel summation order for
    matmul-shaped work (measured ~4x faster backward on the box bench).
    """
    mid = recs[:, :, 0].astype(jnp.int32)
    hit = mid >= 0
    midc = jnp.clip(mid, 0, n_mat - 1)
    oh = (
        jax.nn.one_hot(midc, n_mat, dtype=jnp.float32)
        * hit[..., None]
    )
    w_emis = recs[:, :, 1]
    sel = recs[:, :, 2].astype(jnp.int32)
    col = 3
    pl = jnp.zeros(recs.shape[:2] + (3,), jnp.float32)
    for li in range(n_lights):
        pl = pl + light_spec[li][None, None, :] * recs[:, :, col, None]
        col += 1
    n_em = em_mid.shape[0]
    em_b = jnp.zeros(recs.shape[:2] + (n_mat,), jnp.float32)
    for _ in range(em_k):
        row = jnp.clip(recs[:, :, col].astype(jnp.int32), 0, n_em - 1)
        w = recs[:, :, col + 1]
        col += 2
        em_b = em_b + (
            jax.nn.one_hot(em_mid[row], n_mat, dtype=jnp.float32)
            * w[..., None]
        )
    return {
        "oh": oh,
        "W": w_emis,
        "sel1": (sel == 1).astype(jnp.float32),
        "sel2": (sel == 2).astype(jnp.float32),
        "sel3": (sel == 3).astype(jnp.float32),
        "em_b": em_b,
        "pl": pl,
    }


def replay_fast(mats, pre):
    """Gather-free differentiable replay over preprocessed records ->
    RGB sums [R, 3] (see preprocess_records)."""
    dif = mats["mat_diffuse"][:, :3]
    spc = mats["mat_specular"][:, :3]
    emi = mats["mat_emission"][:, :3]

    diffs = jnp.einsum("drm,mc->drc", pre["oh"], dif)
    specs = jnp.einsum("drm,mc->drc", pre["oh"], spc)
    emis = jnp.einsum("drm,mc->drc", pre["oh"], emi)
    e_nee = jnp.einsum("drm,mc->drc", pre["em_b"], emi) + pre["pl"]
    a = emis * pre["W"][..., None] + diffs * e_nee
    c = (
        pre["sel1"][..., None] * diffs
        + pre["sel2"][..., None] * specs
        + pre["sel3"][..., None]
    )
    # No-advance rows must multiply by exactly 1.
    no_adv = (pre["sel1"] + pre["sel2"] + pre["sel3"]) == 0.0
    c = jnp.where(no_adv[..., None], 1.0, c)

    def step(carry, xs):
        s = carry
        a_v, c_v = xs
        out_v = s * a_v
        return s * c_v, out_v

    _, outs = jax.lax.scan(step, jnp.ones_like(a[0]), (a, c))
    return jnp.sum(outs, axis=0)


def _zeros_cot(tree):
    """Zero cotangents for arbitrary (float/int/bool) pytrees."""
    def z(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)

    return jax.tree.map(z, tree)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _trace_diff_core(mats, scene_ng, rays, seed, options):
    spectrum, coll, _ = trace_megakernel_diff(
        dataclasses.replace(scene_ng, **mats), rays, options, seed
    )
    return spectrum, coll


def _trace_diff_fwd(mats, scene_ng, rays, seed, options):
    spectrum, coll, recs = trace_megakernel_diff(
        dataclasses.replace(scene_ng, **mats), rays, options, seed
    )
    pre = preprocess_records(
        recs, em_material_ids(scene_ng), scene_ng.light_spectrum[:, :3],
        int(scene_ng.num_materials), int(scene_ng.n_point_lights),
        int(scene_ng.emissive_sample_count),
    )
    res = (mats, pre, scene_ng, rays, seed)
    return (spectrum, coll), res


def _trace_diff_bwd(options, res, cot):
    mats, pre, scene_ng, rays, seed = res
    g_spec, _g_coll = cot
    g_rgb = g_spec[:, :3]

    _, vjp = jax.vjp(lambda m: replay_fast(m, pre), mats)
    (g_mats,) = vjp(g_rgb)
    return (g_mats, _zeros_cot(scene_ng), _zeros_cot(rays), _zeros_cot(seed))


_trace_diff_core.defvjp(_trace_diff_fwd, _trace_diff_bwd)


def trace_diff(scene: SceneData, rays, options: RenderOptions, seed):
    """Differentiable on-chip trace: forward = single-bounce megakernel
    (+ records), backward = vjp of the jnp replay. Gradients flow to the
    scene's mat_diffuse / mat_specular / mat_emission leaves — the same
    contract as the jnp wavefront with differentiable=True."""
    mats = {f: getattr(scene, f) for f in DIFF_FIELDS}
    scene_ng = jax.lax.stop_gradient(scene)
    return _trace_diff_core(mats, scene_ng, rays, seed, options)
