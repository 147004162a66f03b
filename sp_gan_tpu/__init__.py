"""sp_gan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) point-cloud generation framework.

A from-scratch rebuild of the capabilities of SP-GAN (Li et al., SIGGRAPH 2021,
reference implementation liruihui/SP-GAN): sphere-guided 3D shape generation and
manipulation. The compute path is pure JAX (XLA on TPU, Pallas kernels for the
hot graph ops); parallelism is expressed through `jax.sharding` meshes rather
than any per-device replication machinery.

Layering (bottom-up):
  ops/       pure-function kernels (kNN, edge features, Chamfer, EMD, FPS, ...)
  nn/        model layers + Generator / Discriminator (flax.linen)
  losses/    GAN losses, gradient penalties
  data/      H5 ingestion, sphere templates, augmentation, host prefetch
  train/     jitted train step, trainer loop, checkpointing
  eval/      MMD/COV/1NN/JSD/FPD metric suite
  parallel/  device-mesh + sharding helpers
  viz/       plotting + point-cloud file IO
  manipulate structured latent-space editing API (the `visual.py` surface)
"""

__version__ = "0.1.0"
