"""EgoNeRF-TPU: a TPU-native re-implementation of Balanced Spherical Grid
egocentric view synthesis (EgoNeRF, CVPR 2023).

This is a ground-up JAX/XLA framework with the same capabilities as the
reference PyTorch implementation (changwoonchoi/EgoNeRF), redesigned around
TPU execution:

* functional core — model parameters are pytrees, every hot path is a pure
  function compiled once with ``jax.jit``;
* static shapes — the reference's data-dependent yin/yang boolean
  partitioning is replaced by a flag-indexed gather from *stacked* grids,
  so a single compiled program covers every batch;
* data parallelism — rays are sharded over a 1-D ``jax.sharding.Mesh``
  with replicated parameters; XLA inserts the gradient ``psum``;
* the "native layer" is XLA itself plus optional Pallas kernels for the
  bilinear vector-matrix gathers (the reference leans on ``F.grid_sample``
  CUDA kernels for the same role — see reference models/EgoNeRF.py:336-346).
"""

__version__ = "0.1.0"
