"""spi_tpu — TPU-native single-image 3D portrait inversion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of FeiiYin/SPI
(CVPR 2023, "3D GAN Inversion with Facial Symmetry Prior"): the EG3D
triplane generator, volumetric renderer, super-resolution network, the
sg/mir latent projectors, the PTI/RotBbox generator-tuning coaches, and
the surrounding preprocessing / editing / metric stack — redesigned for
TPU (static shapes, functional pytree parameters, whole-step jit, SPMD
batching over device meshes).

Layout:
    spi_tpu.ops        — TPU-native primitive ops (upfirdn2d, bias_act,
                         modulated conv resampling, grid_sample, resize)
    spi_tpu.models     — generator networks (StyleGAN2 backbone, triplane
                         renderer, superresolution) + perception nets
    spi_tpu.criteria   — losses (LPIPS, ID, L2, TV, noise-reg, BoxCX)
    spi_tpu.training   — projectors + coaches (optimization-as-inference)
    spi_tpu.parallel   — device-mesh sharding for multi-image batching
    spi_tpu.utils      — camera math, depth warping, image/io helpers
"""

__version__ = "0.1.0"
