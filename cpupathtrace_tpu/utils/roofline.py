"""Roofline / MFU accounting for bench frames.

The reference reports only items/s (ref: benchmark/main.cpp:30); nothing
states how far a frame sits from the machine's limits. This module turns
the kernels' measured visit counters (pallas_megakernel debug_visits /
kernel_traverse visit_ref) into per-frame HBM-byte and VPU-FLOP totals and
expresses each as a fraction of TPU v5e peak, so "speed of light" claims
are checkable numbers: a frame with hbm_frac and vpu_frac both << 1 is
occupancy/latency-bound and has headroom; a frame near 1 on either axis is
at that roof.

Chip constants (TPU v5e, 1 chip):
  * HBM bandwidth 819 GB/s (public v5e spec).
  * VPU f32 peak: (8 sublanes x 128 lanes) vector unit x 4 ALUs at
    ~1.74 GHz = ~7.1e12 f32 op/s. Pair-intersection math runs on the VPU
    (it is elementwise, not matmul), so the MXU's 197 bf16 TFLOP/s is not
    the relevant roof.

Work model (documented, deliberately simple — all constants are visible
here rather than buried in a profiler):
  * One *record visit* (counter slots 1/3) DMAs one pair record from HBM
    and pair-tests it against a ray block: records are
    [rec_rows x 128 lanes] f32 (record bytes read off the table shape) and
    a block is `block_rows` rows of 128 rays.
  * One ray-triangle Moller-Trumbore test is ~50 f32 ops
    (2 crosses + 4 dots + the t/u/v arithmetic, ref semantics
    object.cpp:146-182); the packed-pair formulation adds gating/select
    overhead, folded into MT_FLOPS_PER_PAIR = 64.
  * Sorted-driver glue logically moves the N_STATE path-state arrays
    (+ sort key) once read + once written per executed bounce; the
    bitonic sort network's internal passes are latency/permute-bound,
    not HBM-bound, so this is a lower bound on glue bytes and is
    reported separately.
"""
from __future__ import annotations

V5E_HBM_BYTES_S = 819e9
V5E_VPU_FLOPS_S = 8 * 128 * 4 * 1.74e9  # ~7.13e12 f32 op/s
MT_FLOPS_PER_PAIR = 64
LANES = 128


def binned_frame_roofline(
    *,
    frame_s: float,
    n_rays: int,
    visits_totals,  # (near_sup, near_rec, shadow_sup, shadow_rec)
    executed_bounces: int,
    record_bytes: int,
    record_tris: int,
    block_rows: int,
    n_state: int = 18,
) -> dict:
    """Roofline fractions for one binned (in-kernel cluster traversal)
    frame from its MEASURED visit counters."""
    near_sup, near_rec, shadow_sup, shadow_rec = (int(v) for v in visits_totals)
    rec_visits = near_rec + shadow_rec

    rec_bytes = rec_visits * record_bytes
    # Path state through the bounce kernel + one sort read/write set per
    # executed bounce (lower bound; see module docstring).
    state_bytes = (
        executed_bounces * n_rays * (n_state + 1) * 4 * 2 * 2
    )
    hbm_bytes = rec_bytes + state_bytes

    pair_flops = rec_visits * record_tris * block_rows * LANES * MT_FLOPS_PER_PAIR
    hbm_frac = hbm_bytes / frame_s / V5E_HBM_BYTES_S
    vpu_frac = pair_flops / frame_s / V5E_VPU_FLOPS_S
    return {
        "record_visits": rec_visits,
        "supercluster_visits": near_sup + shadow_sup,
        "executed_bounces": executed_bounces,
        "hbm_gb": round(hbm_bytes / 1e9, 2),
        "hbm_gb_records": round(rec_bytes / 1e9, 2),
        "hbm_gb_state_glue": round(state_bytes / 1e9, 2),
        "vpu_tflop": round(pair_flops / 1e12, 3),
        "hbm_frac": round(hbm_frac, 4),
        "vpu_frac": round(vpu_frac, 4),
        "bound": "hbm" if hbm_frac > vpu_frac else "vpu",
    }


def dense_frame_roofline(
    *,
    frame_s: float,
    n_rays: int,
    n_prims: int,
    executed_bounces: float,
    n_state: int = 18,
) -> dict:
    """Roofline fractions for one dense-scene (while-loop megakernel)
    frame. Scene tables live in SMEM/VMEM, so HBM traffic is just ray IO;
    compute is the per-bounce dense intersect of all primitives for the
    nearest AND the NEE shadow pass plus ~300 estimator flops/ray.

    `executed_bounces` is the average number of while-loop iterations a
    ray LANE executes (lockstep per block until the block-wide all-dead
    early exit): for the closed box with the reference roulette schedule
    (p=1 through depth 4, then ~0.15 survival, worker.cpp:67-70) a
    1024-lane block runs ~4 + ln(1024)/ln(1/0.15) ~ 8 iterations.
    """
    hbm_bytes = n_rays * (6 + 4) * 4  # rays in, spectrum+coverage out
    flops = n_rays * executed_bounces * (
        2 * n_prims * MT_FLOPS_PER_PAIR + 300
    )
    hbm_frac = hbm_bytes / frame_s / V5E_HBM_BYTES_S
    vpu_frac = flops / frame_s / V5E_VPU_FLOPS_S
    return {
        "executed_bounces": executed_bounces,
        "hbm_gb": round(hbm_bytes / 1e9, 3),
        "vpu_tflop": round(flops / 1e12, 3),
        "hbm_frac": round(hbm_frac, 4),
        "vpu_frac": round(vpu_frac, 4),
        "bound": "hbm" if hbm_frac > vpu_frac else "vpu",
    }
