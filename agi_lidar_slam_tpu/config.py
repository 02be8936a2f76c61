"""Typed configuration tree for the engine.

One frozen-dataclass config replaces the reference's four config styles
(scattered rosparams, LIO-SAM's ParamServer utility.h:62-262, LeGO-LOAM's
compile-time utility.h:50-103, LIO-Livox's cv::FileStorage YAML). Presets at
the bottom reproduce each reference package's operating point.

All fields are static (hashable) so configs can be closed over by jit.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass


@dataclass(frozen=True)
class FeatureConfig:
    """A-LOAM / LIO-SAM curvature feature extraction (scanRegistration.cpp:254-432,
    featureExtraction.cpp:108-296)."""

    curvature_window: int = 5  # +-5 neighbors in the curvature sum
    n_sectors: int = 6  # sectors per ring (A-LOAM: 6)
    corners_per_sector: int = 20  # "less sharp" pick budget per sector
    # two-tier A-LOAM quotas (scanRegistration.cpp:289-432): the SHARP tier
    # (2/sector, the sharpest of the less-sharp picks) and the FLAT tier
    # (4/sector, lowest curvature) are the small query sets the scan-to-scan
    # odometry stage matches against the previous scan's DENSE tiers
    sharp_per_sector: int = 2
    flat_per_sector: int = 4
    corner_thresh: float = 0.1  # curvature > thresh -> edge candidate
    surf_thresh: float = 0.1  # curvature < thresh -> planar candidate
    nms_window: int = 5  # suppression half-window around picks
    surf_voxel: float = 0.4  # less-flat downsample leaf (m)
    max_corners: int = 2048  # fixed output capacity
    max_surfs: int = 8192
    min_range: float = 0.3  # blind-zone removal
    max_range: float = 120.0
    segmentation: bool = False  # LeGO-LOAM ground removal + cluster filtering


@dataclass(frozen=True)
class MapConfig:
    """Hashed voxel-block map (replaces ikd-Tree / 4851-cube arrays / per-cube
    kd-trees; SURVEY.md section 7.1 item 4)."""

    log2_slots: int = 18  # hash table has 2**log2_slots blocks
    sub_voxel: float = 0.4  # map resolution: at most one point per sub-voxel
    block_sub: int = 2  # sub-voxels per block edge (block = sub_voxel*block_sub)
    probes: int = 8  # linear-probe length (keep table load <= 25%; a full
    # chain permanently drops one block, so 8 keeps that probability
    # negligible at production load — and the Pallas KNN kernel requires a
    # multiple of 8)
    claim_rounds: int = 8  # insert conflict-resolution rounds (early-exit)
    neighborhood: str = "octant8"  # KNN block set: "octant8" (coverage =
    # block_size/2, fast) or "full27" (coverage = block_size)
    # association kernel: "auto" picks the VMEM-resident Pallas kernel
    # (nn/vmem_knn.py) on TPU for octant8 tables that fit VMEM, else the XLA
    # gather path (nn/knn.py); "xla"/"pallas"/"pallas_interpret" force one.
    knn_kernel: str = "auto"

    @property
    def slots(self) -> int:
        return 1 << self.log2_slots

    @property
    def bucket(self) -> int:
        return self.block_sub**3

    @property
    def block_size(self) -> float:
        return self.sub_voxel * self.block_sub


@dataclass(frozen=True)
class SolverConfig:
    """Scan-to-map Gauss-Newton (A-LOAM laserMapping.cpp:637-817, LIO-SAM
    LMOptimization :1552-1700)."""

    n_outer: int = 2  # association passes (reference: A-LOAM 2, LIO-SAM ~30)
    n_inner: int = 4  # GN re-linearizations per association (A-LOAM: 4 LM iters)
    k_neighbors: int = 5
    # candidate-cache association: the first pass probes the map for cand_k
    # candidates per feature; later outer passes re-rank that cached list at
    # the updated pose (nn/knn.knn_reselect) instead of re-probing — the
    # cand_k - k margin absorbs the cm-scale inter-iteration pose motion.
    # 0 disables (every outer pass re-probes, the reference's behavior).
    # Measured (v5e, 8192 queries, 16k-slot table): probe C=8 3.9 ms vs
    # C=16 5.8 ms vs k=5 3.2 ms; reselect ~0.7 ms — the cache pays off from
    # ~3 association passes up (the livox window: 3 outers x 3 classes; the
    # IESKF: <=5 iterations) and is a small net loss at n_outer=2, so the
    # default is OFF and the multi-pass configs opt in.
    cand_k: int = 0
    # cache "skin distance" (MD neighbor-list style): re-probe the map when
    # the pose has moved more than this since the cached probe (effective
    # motion = |dt| + 30 m lever arm * |dtheta|). Steady-state solves never
    # trip it (mm-cm inter-iteration motion); cold starts / bad initial
    # guesses (decimeter first steps) re-probe instead of re-ranking a stale
    # neighborhood. lax.cond: only the taken branch executes on TPU.
    cand_refresh: float = 0.3
    corner_gate_sq: float = 1.0  # max sq dist of k-th corner neighbor (m^2)
    surf_gate_sq: float = 1.0
    line_eig_ratio: float = 3.0  # lambda_max > ratio * lambda_mid -> line OK
    plane_tol: float = 0.2  # max |n.p + d| over the 5 plane points (m)
    huber_delta: float = 0.1  # robust loss scale (Ceres HuberLoss(0.1))
    degen_eig_thresh: float = 100.0  # eigenvalue clamp on J^T J (LIO-SAM: 100)
    translation_clip: float = 1.0  # max |dt| per GN step (m), stability guard


@dataclass(frozen=True)
class PipelineConfig:
    # NOTE: KNN coverage radius is block_size/2 for octant8 and block_size for
    # full27; it must be >= sqrt(gate_sq) of the solver.
    features: FeatureConfig = FeatureConfig()
    # table sizes follow the BOUNDED live map (bound_radius), not the whole
    # trajectory: a 120-150 m rolling map holds ~1-4k live blocks, so 4k/8k
    # slot tables at <=50% load suffice — and at ~1 KB/row they fit VMEM,
    # which is what lets the Pallas association kernel keep the entire map
    # on-chip (nn/vmem_knn.py). probes=8 gives the chains margin at 50% load.
    # <=25% table load keeps the aligned 8-way probe groups' overflow-drop
    # rate negligible (<0.01% of blocks; the set-associative layout the
    # Pallas kernel needs drops blocks whose group fills)
    corner_map: MapConfig = MapConfig(sub_voxel=0.5, block_sub=4, log2_slots=13,
                                      probes=8)
    # 0.6 m sub-voxels (between A-LOAM's 0.8 plane_res and the 0.5 corner
    # res) make 2.4 m blocks: octant8 coverage 1.2 m with margin over the
    # 1.0 m gate, while keeping the 64-point bucket whose (rows, 64, 3)
    # layout XLA tiles cleanly (bucket 27 measured ~0.5 ms/scan slower on
    # the insert/scatter side despite a smaller association copy)
    surf_map: MapConfig = MapConfig(sub_voxel=0.6, block_sub=4, log2_slots=14,
                                    probes=8)
    solver: SolverConfig = SolverConfig()
    # scan-to-map consumes voxel-downsampled features (laserMapping.cpp:760-775)
    corner_ds_voxel: float = 0.4
    surf_ds_voxel: float = 0.8
    deskew: bool = True  # constant-velocity deskew (A-LOAM DISTORTION flag)
    two_step: bool = False  # LeGO two-step GN (surf->z/roll/pitch, corner->x/y/yaw)
    # optional A-LOAM scan-to-scan odometry stage (laserOdometry.cpp:257-698):
    # registers the new scan against the PREVIOUS scan's features to refine the
    # constant-velocity prediction before scan-to-map
    odometry_stage: bool = False
    # two-tier queries in the odometry stage (A-LOAM parity): match the SHARP/
    # FLAT tiers (2+4 per sector) against the previous scan's dense tiers,
    # instead of dense-vs-dense (laserOdometry.cpp:341-573). Fewer query
    # points, same targets — the reference's asymmetric matching structure.
    odom_two_tier: bool = True
    odom_map: MapConfig = MapConfig(sub_voxel=0.5, block_sub=4, log2_slots=13,
                                    neighborhood="full27")
    odom_solver: SolverConfig = SolverConfig(
        n_outer=2, n_inner=2, corner_gate_sq=4.0, surf_gate_sq=4.0,
        degen_eig_thresh=10.0, plane_tol=0.3,
    )
    # rolling map bound: blocks farther than this (per axis) from the current
    # pose are evicted every scan, keeping the hash table from saturating on
    # long trajectories (A-LOAM laserMapping.cpp:342-559 cube shifts,
    # S-FAST_LIO lasermap_fov_segment :309-365). 0 disables (small worlds).
    bound_radius: float = 150.0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)


# ---------------------------------------------------------------------------
# Presets (reference operating points)
# ---------------------------------------------------------------------------


def preset_aloam_kitti64() -> PipelineConfig:
    """A-LOAM on KITTI HDL-64 (aloam_velodyne_HDL_64.launch: line_res 0.4,
    plane_res 0.8)."""
    return PipelineConfig()


def preset_sim16() -> PipelineConfig:
    """Small 16-beam config for CPU tests and the synthetic simulator."""
    return PipelineConfig(
        features=FeatureConfig(
            corners_per_sector=8, max_corners=512, max_surfs=2048, surf_voxel=0.3
        ),
        corner_map=MapConfig(sub_voxel=0.25, block_sub=4, log2_slots=14,
                             neighborhood="full27"),
        surf_map=MapConfig(sub_voxel=0.5, block_sub=2, log2_slots=15,
                           neighborhood="full27"),
        # 16-beam data is ~8x sparser than HDL-64: more re-association passes
        # (fast yaw rates move far points beyond the gate) and a degeneracy
        # threshold scaled to the lower correspondence counts
        solver=SolverConfig(n_outer=5, n_inner=2, degen_eig_thresh=10.0),
        corner_ds_voxel=0.2,
        surf_ds_voxel=0.4,
    )


def preset_lego_vlp16() -> PipelineConfig:
    """LeGO-LOAM on VLP-16 (utility.h:50-103: 16x1800 image, ground removal,
    cluster segmentation, two-step optimization)."""
    return PipelineConfig(
        features=FeatureConfig(
            corners_per_sector=8, max_corners=1024, max_surfs=4096,
            surf_voxel=0.4, segmentation=True,
        ),
        corner_map=MapConfig(sub_voxel=0.25, block_sub=4, log2_slots=15,
                             neighborhood="full27"),
        surf_map=MapConfig(sub_voxel=0.4, block_sub=2, log2_slots=16,
                           neighborhood="full27"),
        solver=SolverConfig(n_outer=4, n_inner=3, degen_eig_thresh=10.0),
        corner_ds_voxel=0.2,
        surf_ds_voxel=0.4,
        two_step=True,
    )
