"""Place-database footprint + query cost at KITTI-00 scale (VERDICT r04
item 7 'Done' evidence): 1,000 stored keyframes, uint8 store + cached df.

Run: PALLAS_AXON_POOL_IPS= python experiments/placedb_scale.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import qsp_slam_tpu  # noqa
from qsp_slam_tpu.slam.place_recognition import (
    SIG_DIM, add_signature, bow_signature, empty_database, query_topk_with_ref,
)


def main():
    K = 1000
    rng = np.random.default_rng(0)
    db = empty_database(K)
    add_j = jax.jit(add_signature)
    sig0 = None
    t_add = time.perf_counter()
    for k in range(K):
        desc = jnp.asarray((rng.integers(0, 2, (2000, 256)) * 2 - 1).astype(np.int8))
        s = bow_signature(desc, jnp.ones(2000, bool))
        if k == 137:
            sig0 = s
        db = add_j(db, s)
    db = jax.block_until_ready(db)
    add_ms = (time.perf_counter() - t_add) * 1e3 / K
    store_mb = db.signatures.size * db.signatures.dtype.itemsize / 1e6
    f32_mb = db.signatures.size * 4 / 1e6

    qj = jax.jit(lambda d, s: query_topk_with_ref(d, s, k=8))
    jax.block_until_ready(qj(db, sig0))
    ts = []
    for _ in range(9):
        t = time.perf_counter()
        jax.block_until_ready(qj(db, sig0))
        ts.append((time.perf_counter() - t) * 1e3)
    q_ms = float(np.median(ts))
    cands, scores, _ = jax.device_get(qj(db, sig0))
    print(f"stored KFs: {K}  SIG_DIM: {SIG_DIM}")
    print(f"store: {store_mb:.1f} MB uint8 (was {f32_mb:.1f} MB f32)  "
          f"df cache: {SIG_DIM*4/1e6:.2f} MB")
    print(f"query_topk: {q_ms:.2f} ms (CPU)   add: {add_ms:.2f} ms/KF")
    print("self-query rank0:", int(cands[0]) == 137, "score:", round(float(scores[0]), 3))


if __name__ == "__main__":
    main()
