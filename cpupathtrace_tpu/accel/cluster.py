"""Two-level cluster acceleration structure (TPU-native BVH layout).

One-primitive-per-leaf trees (the reference's layout, scene.cpp:12-102) make
traversal on a vector machine gather-bound: every leaf visit gathers a
single triangle per lane. Here the flat BVH is *cut* into spatially coherent
clusters of up to `cluster_size` primitives; the top-level tree is built over
cluster bounds and each leaf visit dense-tests an aligned block of
`cluster_size` triangles for the whole lane — traversal depth shrinks by
~log2(cluster_size) and the inner loop becomes regular VPU work over
contiguous [C, L] blocks.

The cut preserves the reference build's spatial partition (clusters are
subtrees of the same median-split tree), so traversal remains behaviorally a
nearest-hit query with identical results.
"""
from __future__ import annotations

import dataclasses

import numpy as np

import os

from .build import NATIVE_THRESHOLD, FlatBVH, build_bvh

# SAH cluster sweep: 1 = dominant centroid axis (default), 3 = all axes.
# PTX_KRN_* knobs key the scene cache (scene/cache.py), so flipping this
# never serves stale packed tables.
_SAH_AXES = int(os.environ.get("PTX_KRN_SAH_AXES", "1"))

# Greedy merge of adjacent underfull cut leaves (see _merge_cut_runs).
_MERGE_CUT = os.environ.get("PTX_KRN_MERGE", "0") == "1"


def _merge_cut_runs(starts, lens, c_lo, c_hi, cluster_size):
    """Greedily merge CONSECUTIVE cut leaves while the merged run still
    fits `cluster_size` AND the union box's surface area does not exceed
    the parts' sum. The traversal pair-tests a fixed `cluster_size` rows
    per record visit regardless of fill, and a cluster is visited with
    probability ~ its box surface area — so a merge satisfying
    SA(union) <= SA(a) + SA(b) strictly reduces expected pair work.
    Inputs are the DFS-ordered cut (runs are contiguous in the leaf
    order, so merged runs stay contiguous)."""

    def sa(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[0] * d[1] + d[0] * d[2] + d[1] * d[2]

    out_s, out_l, out_lo, out_hi = [], [], [], []
    cs, cl = int(starts[0]), int(lens[0])
    clo, chi = c_lo[0].copy(), c_hi[0].copy()
    for i in range(1, starts.shape[0]):
        li = int(lens[i])
        if cl + li <= cluster_size:
            u_lo = np.minimum(clo, c_lo[i])
            u_hi = np.maximum(chi, c_hi[i])
            if sa(u_lo, u_hi) <= sa(clo, chi) + sa(c_lo[i], c_hi[i]):
                cl += li
                clo, chi = u_lo, u_hi
                continue
        out_s.append(cs)
        out_l.append(cl)
        out_lo.append(clo)
        out_hi.append(chi)
        cs, cl = int(starts[i]), li
        clo, chi = c_lo[i].copy(), c_hi[i].copy()
    out_s.append(cs)
    out_l.append(cl)
    out_lo.append(clo)
    out_hi.append(chi)
    return (
        np.asarray(out_s, np.int64), np.asarray(out_l, np.int64),
        np.stack(out_lo).astype(np.float32),
        np.stack(out_hi).astype(np.float32),
    )


@dataclasses.dataclass
class ClusterBVH:
    """Top-level flat BVH over primitive clusters."""

    # Top-level tree (over clusters): prim field holds cluster ids.
    lo: np.ndarray  # [N,3]
    hi: np.ndarray  # [N,3]
    left: np.ndarray  # [N]
    right: np.ndarray  # [N]
    cluster: np.ndarray  # [N] i32 cluster id on leaves, -1 internal
    depth: int

    # Cluster-blocked primitive data: global prim indices, padded with -1.
    members: np.ndarray  # [C, L] i32
    c_lo: np.ndarray  # [C, 3] cluster bounds (flat, for the sweep intersector)
    c_hi: np.ndarray  # [C, 3]
    n_clusters: int
    cluster_size: int


def build_cluster_bvh(
    prim_lo: np.ndarray,
    prim_hi: np.ndarray,
    cluster_size: int = 64,
    use_native: bool | None = None,
) -> ClusterBVH:
    """Build the two-level structure from primitive bounds [P,3]."""
    n = prim_lo.shape[0]

    # Fast path: the native builder hands back per-node subtree info
    # (first-leaf DFS rank + subtree size + the DFS primitive order), so
    # the cluster cut needs no tree sweeps at all — the numpy
    # level-by-level passes below cost ~8 s at 7.2M primitives. Falls
    # through to the sweep path when the native library is unavailable.
    if (use_native is None and n >= NATIVE_THRESHOLD) or use_native:
        from ..native import build_bvh_native

        built = build_bvh_native(
            np.asarray(prim_lo, np.float32), np.asarray(prim_hi, np.float32),
            want_subtree_info=True,
        )
        if built is not None:
            lo, hi, left, right, prim, depth, begin, size, dfs = built
            leaf = prim >= 0
            parent_size = np.full(size.shape[0], np.iinfo(np.int32).max,
                                  np.int64)
            internal = np.flatnonzero(~leaf)
            l64 = left.astype(np.int64)[internal]
            r64 = right.astype(np.int64)[internal]
            parent_size[l64] = size[internal]
            parent_size[r64] = size[internal]
            cut_nodes = np.flatnonzero(
                (size <= cluster_size) & (parent_size > cluster_size)
            )
            cut_nodes = cut_nodes[
                np.argsort(begin[cut_nodes], kind="stable")
            ]
            starts = begin[cut_nodes].astype(np.int64)
            lens = size[cut_nodes].astype(np.int64)
            c_lo = lo[cut_nodes].astype(np.float32)
            c_hi = hi[cut_nodes].astype(np.float32)
            if _MERGE_CUT and starts.shape[0] > 1:
                starts, lens, c_lo, c_hi = _merge_cut_runs(
                    starts, lens, c_lo, c_hi, cluster_size
                )
            c = starts.shape[0]
            members = np.full((c, cluster_size), -1, np.int32)
            cols = np.arange(cluster_size, dtype=np.int64)
            in_run = cols[None, :] < lens[:, None]
            gather = starts[:, None] + np.minimum(
                cols[None, :], lens[:, None] - 1
            )
            members[in_run] = dfs[gather[in_run]]
            top = build_bvh(c_lo, c_hi, use_native=use_native)
            return ClusterBVH(
                lo=top.lo, hi=top.hi, left=top.left, right=top.right,
                cluster=top.prim, depth=top.depth, members=members,
                c_lo=c_lo, c_hi=c_hi, n_clusters=c,
                cluster_size=cluster_size,
            )

    base = build_bvh(prim_lo, prim_hi, use_native=use_native)

    # Cut the base tree at the first node (walking from the root) whose
    # subtree holds <= cluster_size primitives. All array work, swept one
    # tree LEVEL at a time (O(depth) numpy passes instead of O(nodes)
    # Python steps):
    #   * levels: frontier expansion root -> children;
    #   * subtree primitive counts: bottom-up by level;
    #   * DFS-pre-order leaf offsets: top-down by level
    #     (left child inherits, right child adds the left subtree's count)
    #     — this is what keeps clusters emitted in the left-first DFS
    #     order the supercluster grouping relies on (spatially
    #     consecutive clusters share tight union bounds);
    #   * cut nodes: size fits and the parent's doesn't (sizes shrink
    #     monotonically down the tree);
    #   * members: each cluster is a contiguous run of the DFS leaf
    #     sequence; bounds are the cut node's stored bounds.
    n_nodes = base.prim.shape[0]
    leaf = base.prim >= 0
    left = base.left.astype(np.int64)
    right = base.right.astype(np.int64)

    levels: list[np.ndarray] = [np.zeros(1, np.int64)]
    while True:
        inner = levels[-1][~leaf[levels[-1]]]
        if inner.size == 0:
            break
        levels.append(np.concatenate([left[inner], right[inner]]))

    size = np.where(leaf, 1, 0).astype(np.int64)
    for lvl in reversed(levels):
        inner = lvl[~leaf[lvl]]
        size[inner] = size[left[inner]] + size[right[inner]]

    leaf_start = np.zeros(n_nodes, np.int64)  # DFS rank of first leaf
    for lvl in levels:
        inner = lvl[~leaf[lvl]]
        leaf_start[left[inner]] = leaf_start[inner]
        leaf_start[right[inner]] = leaf_start[inner] + size[left[inner]]

    parent_size = np.full(n_nodes, np.iinfo(np.int64).max, np.int64)
    internal = np.flatnonzero(~leaf)
    parent_size[left[internal]] = size[internal]
    parent_size[right[internal]] = size[internal]
    cut_nodes = np.flatnonzero(
        (size <= cluster_size) & (parent_size > cluster_size)
    )
    cut_nodes = cut_nodes[np.argsort(leaf_start[cut_nodes], kind="stable")]

    leaf_nodes = np.flatnonzero(leaf)
    ordered_prims = np.empty(n, np.int64)  # leaves in DFS order
    ordered_prims[leaf_start[leaf_nodes]] = base.prim[leaf_nodes]
    starts = leaf_start[cut_nodes]
    lens = size[cut_nodes]
    c_lo = base.lo[cut_nodes].astype(np.float32)
    c_hi = base.hi[cut_nodes].astype(np.float32)
    if _MERGE_CUT and starts.shape[0] > 1:
        starts, lens, c_lo, c_hi = _merge_cut_runs(
            starts, lens, c_lo, c_hi, cluster_size
        )

    c = starts.shape[0]
    members = np.full((c, cluster_size), -1, np.int32)
    cols = np.arange(cluster_size, dtype=np.int64)
    in_run = cols[None, :] < lens[:, None]
    gather = starts[:, None] + np.minimum(cols[None, :], lens[:, None] - 1)
    members[in_run] = ordered_prims[gather[in_run]]

    top = build_bvh(c_lo, c_hi, use_native=use_native)
    return ClusterBVH(
        lo=top.lo,
        hi=top.hi,
        left=top.left,
        right=top.right,
        cluster=top.prim,
        depth=top.depth,
        members=members,
        c_lo=c_lo,
        c_hi=c_hi,
        n_clusters=c,
        cluster_size=cluster_size,
    )


def build_sah_clusters(
    prim_lo: np.ndarray,
    prim_hi: np.ndarray,
    cluster_size: int = 64,
    n_bins: int = 16,
):
    """Binned-SAH top-down clustering (members [C, L] i32 padded with -1,
    c_lo [C, 3], c_hi [C, 3]), clusters emitted in DFS order.

    The reference build policy (median split on the axis minimizing the two
    child surface areas, src/scene/scene.cpp:12-102) balances COUNTS; its
    subtree boxes overlap badly on organic meshes, and the in-kernel
    traversal's record-visit count is directly proportional to how many
    cluster boxes a ray beam enters (docs/DESIGN_large_scenes.md round-3
    notes: cluster bounds quality is the highest-sensitivity lever — a
    sloppier packing measured 2x slower end to end). Here each node is
    split by a 16-bin surface-area-heuristic sweep on its dominant centroid
    axis: cost(k) = N_L*SA_L + N_R*SA_R, the standard greedy minimizer of
    expected intersection work. Splitting recurses until nodes hold
    <= cluster_size primitives.

    Everything is LEVEL-SWEPT vectorized numpy (one pass per tree level,
    like build_cluster_bvh): per-node segment reductions via reduceat over
    the contiguously-partitioned slot order, per-(node, bin) aggregates via
    bincount / minimum.at, and the partition via one stable lexsort per
    level. ~1 s for 200k primitives.
    """
    n = int(prim_lo.shape[0])
    f32 = np.float32
    prim_lo = np.asarray(prim_lo, f32)
    prim_hi = np.asarray(prim_hi, f32)
    if n == 0:
        return (np.full((1, cluster_size), -1, np.int32),
                np.zeros((1, 3), f32), np.zeros((1, 3), f32))
    cent = (prim_lo + prim_hi) * 0.5

    order = np.arange(n, dtype=np.int64)
    starts = np.array([0], dtype=np.int64)
    counts = np.array([n], dtype=np.int64)
    out_ranges: list[tuple[int, int]] = []

    def _sa(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 0] * d[..., 2] + d[..., 1] * d[..., 2]

    while starts.size:
        leaf = counts <= cluster_size
        for s, c in zip(starts[leaf], counts[leaf]):
            out_ranges.append((int(s), int(c)))
        starts, counts = starts[~leaf], counts[~leaf]
        if not starts.size:
            break
        a = starts.size

        # Per-slot node index over the active ranges (slots of leaf ranges
        # are frozen — later levels only repartition active ranges).
        sel = np.concatenate(
            [order[s:s + c] for s, c in zip(starts, counts)]
        ) if a > 1 else order[starts[0]:starts[0] + counts[0]].copy()
        slot_node = np.repeat(np.arange(a, dtype=np.int64), counts)
        seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        csel = cent[sel]

        cmin = np.minimum.reduceat(csel, seg_starts, axis=0)
        cmax = np.maximum.reduceat(csel, seg_starts, axis=0)
        ext = cmax - cmin
        degenerate = ext.max(axis=1) <= 0.0

        # Candidate axes: the dominant centroid axis (default), or a full
        # 3-axis SAH sweep picking the (axis, bin) of least cost
        # (PTX_KRN_SAH_AXES=3 — ~3x this phase's build time for tighter
        # cluster boxes; record-visit count tracks box quality directly).
        dom = np.argmax(ext, axis=1)
        if _SAH_AXES >= 3:
            cand_axes = range(3)
        else:
            cand_axes = None

        def eval_axis(ax_per_node):
            """Bin ids, per-bin aggregates, and best SAH split for a
            per-node axis choice [a]. Returns (b, kbest, costbest)."""
            span = ext[np.arange(a), ax_per_node]
            cax = csel[np.arange(sel.size), ax_per_node[slot_node]]
            lo_ax = cmin[np.arange(a), ax_per_node][slot_node]
            sp_ax = np.maximum(span, 1e-30)[slot_node]
            b = np.minimum(
                ((cax - lo_ax) / sp_ax * n_bins).astype(np.int64),
                n_bins - 1,
            )
            key = slot_node * n_bins + b
            bc = np.bincount(key, minlength=a * n_bins).reshape(a, n_bins)
            blo = np.full((a * n_bins, 3), np.inf, f32)
            bhi = np.full((a * n_bins, 3), -np.inf, f32)
            np.minimum.at(blo, key, prim_lo[sel])
            np.maximum.at(bhi, key, prim_hi[sel])
            blo = blo.reshape(a, n_bins, 3)
            bhi = bhi.reshape(a, n_bins, 3)
            # Prefix/suffix sweeps -> SAH cost of splitting after bin k.
            plo = np.minimum.accumulate(blo, axis=1)
            phi = np.maximum.accumulate(bhi, axis=1)
            pn = np.cumsum(bc, axis=1)
            slo = np.minimum.accumulate(blo[:, ::-1], axis=1)[:, ::-1]
            shi = np.maximum.accumulate(bhi[:, ::-1], axis=1)[:, ::-1]
            sn = np.cumsum(bc[:, ::-1], axis=1)[:, ::-1]
            nl = pn[:, :-1]
            nr = sn[:, 1:]
            cost = nl * _sa(plo[:, :-1], phi[:, :-1]) + nr * _sa(
                slo[:, 1:], shi[:, 1:]
            )
            cost = np.where((nl == 0) | (nr == 0), np.inf, cost)
            kbest = np.argmin(cost, axis=1)
            cbest = cost[np.arange(a), kbest]
            # A zero-extent axis cannot split by centroid.
            cbest = np.where(span <= 0.0, np.inf, cbest)
            return b, kbest, cbest

        if cand_axes is None:
            b, kbest, cbest = eval_axis(dom)
        else:
            b = kbest = cbest = None
            for ax in cand_axes:
                ax_v = np.full(a, ax, np.int64)
                b_ax, k_ax, c_ax = eval_axis(ax_v)
                if cbest is None:
                    b, kbest, cbest = b_ax, k_ax, c_ax
                else:
                    upd = c_ax < cbest
                    cbest = np.where(upd, c_ax, cbest)
                    kbest = np.where(upd, k_ax, kbest)
                    b = np.where(upd[slot_node], b_ax, b)

        no_split = ~np.isfinite(cbest) | degenerate

        # Side per slot: SAH bin split, or median-of-range fallback when the
        # node cannot be split by centroid (all centroids coincide).
        side = (b > kbest[slot_node]).astype(np.int8)
        if no_split.any():
            in_node_pos = np.arange(sel.size) - seg_starts[slot_node]
            med = (counts // 2)[slot_node]
            fb = no_split[slot_node]
            side = np.where(fb, (in_node_pos >= med).astype(np.int8), side)

        # Stable partition within each node, writing back into `order`.
        perm = np.lexsort((side, slot_node))
        sel = sel[perm]
        side = side[perm]
        write = np.concatenate(
            [np.arange(s, s + c) for s, c in zip(starts, counts)]
        ) if a > 1 else np.arange(starts[0], starts[0] + counts[0])
        order[write] = sel

        nls = np.bincount(slot_node, weights=1 - side.astype(np.int64),
                          minlength=a).astype(np.int64)
        starts = np.concatenate([starts, starts + nls])
        counts = np.concatenate([nls, counts - nls])

    out_ranges.sort()  # ranges are disjoint: start order == DFS order
    c = len(out_ranges)
    members = np.full((c, cluster_size), -1, np.int32)
    for i, (s, ln) in enumerate(out_ranges):
        members[i, :ln] = order[s:s + ln]
    valid = members >= 0
    midx = np.maximum(members, 0)
    c_lo = np.where(valid[..., None], prim_lo[midx], np.inf).min(axis=1)
    c_hi = np.where(valid[..., None], prim_hi[midx], -np.inf).max(axis=1)
    return members, c_lo.astype(f32), c_hi.astype(f32)
