"""Generator networks: StyleGAN2 triplane backbone, volumetric renderer,
superresolution, and the TriPlaneGenerator facade.

Design: functional modules. Each module is a frozen dataclass holding
static architecture config, with `init(key) -> params` returning a
nested-dict pytree whose key structure mirrors the reference torch
module names (so the torch->JAX weight converter is a key-split). All
`apply`/`__call__` methods are pure: (params, inputs) -> outputs, safe
to jit/grad/vmap/shard_map.
"""

from spi_tpu.models.triplane import TriPlaneGenerator, ffhq512_128_config

__all__ = ["TriPlaneGenerator", "ffhq512_128_config"]
