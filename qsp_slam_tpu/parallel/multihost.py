"""Multi-host (DCN) groundwork: `jax.distributed` init + global-array BA.

The reference is a single-process shared-memory system (SURVEY.md §2.7); the
TPU-native scale-out path keeps the same sharded-BA program
(`parallel/sharded_ba.py`) and widens the mesh across processes:

- every process calls :func:`initialize` (JAX distributed runtime over the
  coordinator), after which `jax.devices()` is the GLOBAL device list;
- each process materializes its addressable shard of the edge table via
  :func:`make_global` (`jax.make_array_from_callback`), state arrays are
  replicated;
- `sharded_local_ba` then runs unchanged — the per-iteration psum of the
  normal blocks is the only cross-host collective, riding DCN exactly where
  it rode ICI on a single host.

Runnable as a worker for the 2-process CPU test
(`tests/test_distributed.py`):

    python -m qsp_slam_tpu.parallel.multihost \
        --coordinator localhost:12421 --num-processes 2 --process-id 0
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_count: int | None = None,
    platform: str | None = None,
) -> None:
    """Bring up the JAX distributed runtime (call before first device use).

    `platform='cpu'` + `local_device_count` forces an n-virtual-device CPU
    host (the test topology); on real TPU pods both are left None and the
    plugin discovers local chips.
    """
    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global(mesh, spec, x):
    """Build a global (possibly cross-process) array from replicated host data.

    Every process passes the SAME full `x`; each materializes only its
    addressable shards.  Works for sharded (P('edges')) and replicated (P())
    specs alike, single- or multi-process.
    """
    import jax
    from jax.sharding import NamedSharding

    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def global_ba_inputs(mesh, Tcw, points, cam_fixed, edges, axis: str = "edges"):
    """Pad + globalize a BA problem for a (multi-process) edge mesh."""
    from jax.sharding import PartitionSpec as P

    from .sharded_ba import pad_edges_for_mesh

    edges = pad_edges_for_mesh(edges, mesh.shape[axis])
    shd, rep = P(axis), P()
    g_edges = type(edges)(*(make_global(mesh, shd, v) for v in edges))
    return (
        make_global(mesh, rep, Tcw),
        make_global(mesh, rep, points),
        make_global(mesh, rep, cam_fixed),
        g_edges,
    )


def _worker(args) -> None:
    """2-process CPU worker: distributed init + one sharded BA, print cost."""
    initialize(
        args.coordinator,
        args.num_processes,
        args.process_id,
        local_device_count=args.local_devices,
        platform="cpu",
    )
    import jax

    import qsp_slam_tpu  # noqa: F401  (matmul precision)
    from qsp_slam_tpu.data.synthetic import ba_edges, make_ba_problem
    from qsp_slam_tpu.parallel.sharded_ba import make_edge_mesh, sharded_local_ba

    assert jax.process_count() == args.num_processes
    mesh = make_edge_mesh()  # ALL global devices
    prob = make_ba_problem(num_cams=6, num_points=200, obs_per_point=4, seed=3)
    import jax.numpy as jnp

    cam_fixed = jnp.zeros(6, bool).at[0].set(True)
    gT, gp, gfix, gedges = global_ba_inputs(
        mesh, prob.Tcw_init, prob.points_init,
        np.asarray(cam_fixed), ba_edges(prob),
    )
    Tcw, points, cost = sharded_local_ba(
        mesh, gT, gp, gfix, gedges, prob.intr, iters=6, pre_padded=True
    )
    jax.block_until_ready(cost)
    print(json.dumps({
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "cost": float(np.asarray(cost)),
    }), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--local-devices", type=int, default=2)
    _worker(p.parse_args(argv))


if __name__ == "__main__":
    main()
