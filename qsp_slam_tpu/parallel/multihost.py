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
    """2-process CPU worker: distributed init + one sharded BA, print cost.

    With --bench, also reports steady-state wall time of a 10-iteration BA
    so the orchestrator can quantify cross-process collective overhead."""
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
    out = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "cost": float(np.asarray(cost)),
    }
    if args.bench:
        import time

        run = lambda: sharded_local_ba(
            mesh, gT, gp, gfix, gedges, prob.intr, iters=10, pre_padded=True
        )
        jax.block_until_ready(run())  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            ts.append(time.perf_counter() - t0)
        out["t_ms"] = round(float(np.median(ts)) * 1e3, 2)
    print(json.dumps(out), flush=True)


def _spawn_workers(num_processes: int, local_devices: int, bench: bool):
    """Launch worker processes on localhost; return their parsed JSON."""
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "qsp_slam_tpu.parallel.multihost",
                "--coordinator", f"localhost:{port}",
                "--num-processes", str(num_processes),
                "--process-id", str(pid),
                "--local-devices", str(local_devices),
            ]
            + (["--bench"] if bench else []),
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            if p.returncode != 0:
                raise RuntimeError(f"worker failed:\n{err[-2000:]}")
            outs.append(
                json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
            )
    finally:
        # A failed/timed-out worker must not leave its sibling blocked in
        # the distributed rendezvous (kill by Popen handle, never pattern).
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.communicate()
    return outs


def orchestrate(local_devices: int = 2) -> dict:
    """Measure cross-process (DCN-role) overhead: the SAME 4-device sharded
    BA run as 1 process x 4 devices vs 2 processes x 2 devices on localhost.

    On one box all processes share the host's cores, so the single-process
    time is the shared-core ideal and the ratio isolates what the
    process boundary adds (serialization + cross-process collectives) —
    a conservative lower bound on real 2-host DCN scaling, where each
    process brings its own chips."""
    one = _spawn_workers(1, 2 * local_devices, bench=True)
    two = _spawn_workers(2, local_devices, bench=True)
    t1 = one[0]["t_ms"]
    t2 = max(o["t_ms"] for o in two)
    result = {
        "problem": "6 KF / 200 pts sharded BA, 10 LM iters, 4 devices",
        "t_1proc_ms": t1,
        "t_2proc_ms": t2,
        "cross_process_overhead": round(t2 / t1 - 1.0, 3),
        "cost_agrees": abs(one[0]["cost"] - two[0]["cost"])
        < 1e-3 * abs(one[0]["cost"]) + 1e-6,
        "note": (
            "localhost: both topologies share the same cores, so t_1proc is "
            "the shared-core ideal; the ratio is the process-boundary cost"
        ),
    }
    print(json.dumps({"multihost": result}), flush=True)
    return result


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--orchestrate", action="store_true")
    p.add_argument("--coordinator")
    p.add_argument("--num-processes", type=int)
    p.add_argument("--process-id", type=int)
    p.add_argument("--local-devices", type=int, default=2)
    p.add_argument("--bench", action="store_true")
    args = p.parse_args(argv)
    if args.orchestrate:
        orchestrate(args.local_devices)
    else:
        if (
            not args.coordinator
            or args.num_processes is None
            or args.process_id is None
        ):
            p.error(
                "--coordinator, --num-processes and --process-id are "
                "required in worker mode (or use --orchestrate)"
            )
        _worker(args)


if __name__ == "__main__":
    main()
