"""TPU-native edge-based stereo visual odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Brown-LEMS/Edge_Based_Visual_Odometry (C++17/OpenMP reference):

  - Third-order subpixel edge detection (TOED) as fused XLA/Pallas kernels
    over 2x-upsampled gradient fields (reference: src/toed/cpu_toed.cpp).
  - Stereo edge matching as a masked fixed-shape filter cascade over
    (N_left, MAX_CAND) candidate tensors (reference: src/Stereo_Matches.cpp).
  - Temporal quad matching KF<->CF (reference: src/Temporal_Matches.cpp).
  - Constraint-gated 2-point RANSAC pose solver, fully vectorized
    (reference: src/MotionTracker.cpp).
  - Dataset iterators for KITTI / EuRoC / ETH3D stereo / ETH3D SLAM
    (reference: src/Stereo_Iterator.cpp, src/Dataset.cpp).

Everything on the device side is fixed-shape, masked, and jit-compiled;
multi-chip scaling uses jax.sharding over a Mesh (frames/tiles axis), not
the reference's OpenMP threads.
"""

import jax as _jax

# Subpixel edge geometry needs true f32 accumulation: on TPU the default
# matmul/conv path drops to bf16 passes, which costs ~5e-3 absolute error in
# pose/triangulation math. HIGHEST keeps the MXU in (3-pass) f32-equivalent
# mode; hot kernels that can tolerate bf16 opt in explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from edge_based_visual_odometry_tpu.config import VOConfig, CameraConfig, StereoRig

__version__ = "0.1.0"

__all__ = ["VOConfig", "CameraConfig", "StereoRig", "__version__"]
