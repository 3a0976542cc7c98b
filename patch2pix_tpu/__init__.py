"""patch2pix_tpu — TPU-native correspondence + SfM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
GrumpyZhou/patch2pix (CVPR 2021): epipolar-guided pixel-level
correspondence learning (ResNet feature pyramid -> 4D correlation ->
neighbourhood consensus -> two-stage pixel regression), plus a
TPU-native SfM backend (two-view geometry, triangulation, distributed
Schur-complement bundle adjustment) that the reference does not have.

Design stance (TPU-first, not a port):
  * every on-device tensor is fixed-shape; matches are ``(B, N, 4)``
    arrays with validity masks instead of Python lists,
  * filtering/dedup is device-side masking + argmax consistency
    (no host ``np.unique`` round-trips),
  * the hot ops (4D correlation, conv4d neighbourhood consensus,
    patch gather) have fused Pallas kernels with jnp reference paths,
  * multi-chip scaling goes through ``jax.sharding.Mesh`` + XLA
    collectives, never host loops.
"""

__version__ = "0.1.0"
