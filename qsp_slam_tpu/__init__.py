"""qsp_slam_tpu — a TPU-native object-level SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of QSP-SLAM
(quadric object SLAM with DeepSDF shape priors, an ORB-SLAM2-derived
C++/g2o/PyTorch system).  See SURVEY.md at the repo root for the reference
structural analysis and the layer-by-layer parity map.

Subpackages
-----------
core        SE3/Sim3/quadric/plane math (batched, autodiff-safe)
ops         Pallas TPU kernels (FAST, BRIEF, Hamming matching, popcount)
opt         Factor-graph Gauss-Newton/LM, Schur/PCG bundle adjustment
models      DeepSDF decoder + latent-code shape optimization
frontend    Image pyramid, ORB extraction/matching, PnP, initialization
perception  Ground plane, ellipsoid extraction, Manhattan planes, relations
slam        Map state, tracking, local mapping, loop closing, System facade
parallel    Device-mesh sharding for distributed BA
data        Dataset readers (TUM/KITTI), cached-detection replay, synthetic
eval        Trajectory ATE + object-map metrics (evo-equivalent)
"""

import jax as _jax

# Geometry/optimization math in this framework lives in small matrices where
# bf16 MXU passes destroy accuracy (1e-2 orthonormality error on 3x3 products).
# Default to full f32 matmul precision; the few genuinely hot MXU kernels
# (DeepSDF decoder, Hamming-distance matmuls) request lower precision locally.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

