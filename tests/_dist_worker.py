"""Worker process for the two-process jax.distributed parity test.

Run as:  python tests/_dist_worker.py  with env
  DIST_COORD=localhost:<port>  DIST_NPROC=2  DIST_PID=<0|1>  DIST_OUT=<npz>

Each process owns 2 virtual CPU devices -> a 4-device global mesh across the
two processes; the edge-sharded pose-graph solve runs with its per-node
reductions psumming over the process boundary — the exact DCN collective
path a 2-host TPU deployment uses (SURVEY.md section 5.8), exercised on CPU
the way the reference never could (it has no distributed mode at all).

`build_problem` is imported by the parent test to compute the single-process
reference solution.
"""

import os
import sys


def build_problem():
    """Deterministic pose-graph problem: K noisy circle poses, odometry
    chain + 2 loop edges. Identical in every process (fixed seeds)."""
    import jax
    import jax.numpy as jnp

    from agi_lidar_slam_tpu.geometry import se3, so3
    from agi_lidar_slam_tpu.graph.pose_graph import (add_edge, between_measurement,
                                                     empty_edges)

    K, CAP = 12, 16
    ts = jnp.arange(K, dtype=jnp.float32) * 0.4
    gt_q = jax.vmap(lambda th: so3.quat_exp(jnp.asarray([0.0, 0.0, 1.0]) * th))(ts)
    gt_t = jnp.stack([4.0 * jnp.sin(ts), 4.0 * (1 - jnp.cos(ts)),
                      jnp.zeros_like(ts)], axis=-1)
    gt = se3.Pose(gt_q, gt_t)
    key = jax.random.PRNGKey(7)
    kq, kt = jax.random.split(key)
    noisy_t = gt_t + 0.15 * jax.random.normal(kt, gt_t.shape)
    dq = 0.03 * jax.random.normal(kq, (K, 3))
    noisy_q = jax.vmap(lambda q, d: so3.quat_normalize(
        so3.quat_mul(q, so3.quat_exp(d))))(gt_q, dq)
    poses = se3.Pose(noisy_q, noisy_t)

    edges = empty_edges(CAP)
    gti = lambda i: se3.Pose(gt.q[i], gt.t[i])
    for i in range(K - 1):
        edges = add_edge(edges, i, i + 1, between_measurement(gti(i), gti(i + 1)),
                         w_rot=100.0, w_trans=100.0)
    for (a, b) in [(0, K - 1), (2, 9)]:
        edges = add_edge(edges, a, b, between_measurement(gti(a), gti(b)),
                         w_rot=100.0, w_trans=100.0)
    return poses, jnp.int32(K), edges


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    import jax._src.xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)

    from agi_lidar_slam_tpu.parallel.distributed import init_distributed

    init_distributed(coordinator=os.environ["DIST_COORD"],
                     num_processes=int(os.environ["DIST_NPROC"]),
                     process_id=int(os.environ["DIST_PID"]))
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from agi_lidar_slam_tpu.graph.pose_graph import (EdgeSet,
                                                     sharded_solve_pose_graph)
    from agi_lidar_slam_tpu.parallel.distributed import make_mesh_2d

    mesh = make_mesh_2d(dp=4, mp=1)

    # explicit cross-process psum sanity: 4 shards of ones sum to 4
    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), np.ones(2, np.float32))
    total = jax.jit(
        jax.shard_map(lambda x: jax.lax.psum(jnp.sum(x), "dp"),
                      mesh=mesh, in_specs=P("dp"), out_specs=P()))(ones)
    assert float(np.asarray(total.addressable_data(0))) == 4.0

    poses, n_nodes, edges = build_problem()

    def shard_edges(e: EdgeSet) -> EdgeSet:
        """Each process hands its local half of every edge array; count
        replicates."""
        pid = jax.process_index()
        half = e.i.shape[0] // 2

        def sh(x):
            loc = np.asarray(x)[pid * half:(pid + 1) * half]
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P("dp")), loc)

        return EdgeSet(i=sh(e.i), j=sh(e.j), z_q=sh(e.z_q), z_t=sh(e.z_t),
                       w_rot=sh(e.w_rot), w_trans=sh(e.w_trans),
                       kind=sh(e.kind), valid=sh(e.valid),
                       count=jax.make_array_from_process_local_data(
                           NamedSharding(mesh, P()), np.asarray(e.count)))

    def repl(x):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(x))

    from agi_lidar_slam_tpu.geometry import se3
    poses_g = se3.Pose(repl(poses.q), repl(poses.t))
    solved = sharded_solve_pose_graph(mesh, poses_g, repl(n_nodes),
                                      shard_edges(edges))
    q = np.asarray(solved.q.addressable_data(0))
    t = np.asarray(solved.t.addressable_data(0))
    if jax.process_index() == 0:
        np.savez(os.environ["DIST_OUT"], q=q, t=t)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
