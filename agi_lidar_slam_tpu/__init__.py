"""agi_lidar_slam_tpu — a TPU-native LiDAR SLAM engine (JAX/XLA/Pallas/pjit).

One engine, multiple configurations, reproducing the capabilities of the
reference suite (A-LOAM, LeGO-LOAM, LIO-SAM, S-FAST_LIO, LIO-Livox,
livox_mapping) with a from-scratch TPU-first design. See SURVEY.md for the
blueprint and file:line citations into the reference.
"""

from .config import (
    FeatureConfig,
    MapConfig,
    PipelineConfig,
    SolverConfig,
    preset_aloam_kitti64,
    preset_sim16,
)

__all__ = [
    "FeatureConfig",
    "MapConfig",
    "PipelineConfig",
    "SolverConfig",
    "preset_aloam_kitti64",
    "preset_sim16",
]

__version__ = "0.1.0"
