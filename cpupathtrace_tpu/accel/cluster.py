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

from .build import FlatBVH, build_bvh


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
    base = build_bvh(prim_lo, prim_hi, use_native=use_native)

    # Collect subtree primitive sets by cutting the base tree at nodes whose
    # subtree size <= cluster_size. Subtree sizes via a reverse pass (children
    # always have higher indices than parents in the builder's layout).
    n_nodes = base.prim.shape[0]
    size = np.where(base.prim >= 0, 1, 0).astype(np.int64)
    for i in range(n_nodes - 1, -1, -1):
        if base.prim[i] < 0:
            size[i] = size[base.left[i]] + size[base.right[i]]

    clusters: list[np.ndarray] = []
    cluster_of_node: dict[int, int] = {}

    def leaves_under(node: int) -> np.ndarray:
        out = []
        stack = [node]
        while stack:
            k = stack.pop()
            if base.prim[k] >= 0:
                out.append(base.prim[k])
            else:
                stack.append(base.right[k])
                stack.append(base.left[k])
        return np.asarray(out, np.int64)

    # Walk from the root; cut at the first node with size <= cluster_size.
    stack = [0]
    while stack:
        k = stack.pop()
        if size[k] <= cluster_size or base.prim[k] >= 0:
            cluster_of_node[k] = len(clusters)
            clusters.append(leaves_under(k))
        else:
            stack.append(base.right[k])
            stack.append(base.left[k])

    c = len(clusters)
    members = np.full((c, cluster_size), -1, np.int32)
    c_lo = np.empty((c, 3), np.float32)
    c_hi = np.empty((c, 3), np.float32)
    for i, idx in enumerate(clusters):
        members[i, : idx.shape[0]] = idx
        c_lo[i] = prim_lo[idx].min(axis=0)
        c_hi[i] = prim_hi[idx].max(axis=0)

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
