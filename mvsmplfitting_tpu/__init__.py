"""TPU-native multi-view SMPL fitting engine.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
boycehbz/MvSMPLfitting: multi-view 2D-keypoint driven SMPL fitting with
staged annealing, VPoser/GMM/angle priors, robustified reprojection
residuals, and an optional voxelized-SDF interpenetration term — built
as pure functions, jitted end-to-end, and shardable over a
(frames x cameras) device mesh.

Subpackages
-----------
ops       low-level math: rotations, robustifiers, triangulation, alignment
models    body model (SMPL + scale), camera, priors, VPoser decoder
fitting   energy, staged solvers (LM primary, L-BFGS parity), initialization
parallel  device-mesh layout, sharded batched fitting, Schur elimination
data      dataset walking, keypoint/camera file IO, result writers
detect    detection frontend (YOLOX-style detector, heatmap pose head)
cli       command-line drivers
"""

__version__ = "0.1.0"
