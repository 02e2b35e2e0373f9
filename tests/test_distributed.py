"""Multi-host groundwork: 2-process `jax.distributed` CPU run of sharded BA.

Spawns two real OS processes that bring up the JAX distributed runtime on
localhost, form one 4-device global mesh (2 virtual CPU devices each), and
run the SAME sharded-BA program used single-host.  Costs must agree across
processes and with a single-process run of the identical problem.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_ba_agrees():
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m", "qsp_slam_tpu.parallel.multihost",
                    "--coordinator", f"localhost:{port}",
                    "--num-processes", "2",
                    "--process-id", str(pid),
                    "--local-devices", "2",
                ],
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    assert {o["process_id"] for o in outs} == {0, 1}
    for o in outs:
        assert o["process_count"] == 2
        assert o["global_devices"] == 4
    assert np.isfinite(outs[0]["cost"])
    # Both processes hold the same replicated result.
    np.testing.assert_allclose(outs[0]["cost"], outs[1]["cost"], rtol=1e-6)

    # Single-process run of the identical problem on a 4-device mesh.
    import jax.numpy as jnp

    from qsp_slam_tpu.data.synthetic import ba_edges, make_ba_problem
    from qsp_slam_tpu.parallel.sharded_ba import make_edge_mesh, sharded_local_ba

    prob = make_ba_problem(num_cams=6, num_points=200, obs_per_point=4, seed=3)
    cam_fixed = jnp.zeros(6, bool).at[0].set(True)
    _, _, cost = sharded_local_ba(
        make_edge_mesh(4),
        jnp.asarray(prob.Tcw_init), jnp.asarray(prob.points_init),
        cam_fixed, ba_edges(prob), prob.intr, iters=6,
    )
    np.testing.assert_allclose(outs[0]["cost"], float(cost), rtol=1e-4)
