"""Volumetric rendering: ray sampling, triplane feature lookup, MLP
decoding, importance sampling, and alpha compositing.

Behavioral spec: eg3d/training/volumetric_rendering/. The whole render
is a fixed-shape pure function (rays x samples tensors) so XLA can tile
the feature MLP onto the MXU and fuse the compositing chain.
"""

from spi_tpu.models.rendering.ray_sampler import sample_rays
from spi_tpu.models.rendering.renderer import ImportanceRenderer, RenderingOptions

__all__ = ["sample_rays", "ImportanceRenderer", "RenderingOptions"]
