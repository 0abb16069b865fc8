"""depthmodelhardening_tpu — a TPU-native (JAX/XLA/Pallas) framework for
adversarial hardening of self-supervised monocular depth estimation.

Re-designed from scratch for TPUs with the capabilities of the reference
PyTorch pipeline "Adversarial Training of Self-supervised Monocular Depth
Estimation against Physical-World Attacks" (ICLR 2023):

  * Monodepth2 / DepthHints / ManyDepth model families (flax.linen, NHWC),
  * fully on-device EoT physical patch synthesis + attack inner loops
    (lax.fori_loop / lax.while_loop; nothing leaves HBM per PGD step),
  * self-supervised stereo photometric training, supervised distillation,
    and SimSiam contrastive hardening objectives,
  * SPMD data-parallel training over a `jax.sharding.Mesh`,
  * an evaluation suite mirroring the reference's metric conventions.

Layout:
  ops/         geometry, bilinear sampling, resize, SSIM, losses, metrics
  models/      ResNet encoders, depth/pose decoders, SimSiam, wrappers
  physics/     KITTI calibration, EoT projective compositor, light simulation
  attacks/     PGD / L0 / L2 / APGD / Square / random / light / physical
  data/        KITTI raw + object loaders, synthetic fixtures
  training/    distillation + full hardening trainers, checkpoints, config
  evaluation/  clean + attack evaluation suites
  parallel/    mesh + sharding helpers
"""

__version__ = "0.1.0"
