"""CLIP-guided domain editing of a tuned EG3D generator.

TPU-native rebuild of the reference ZSSGAN / StyleGAN-NADA layer
(ZSSGAN/model/ZSSGAN_eg3d.py, ZSSGAN/criteria/clip_loss.py,
ZSSGAN/train.py): twin frozen/trainable generators rendered at the
canonical front camera, moved along a CLIP text direction with
conv-layer-only parameter masking.
"""

from spi_tpu.editing.clip_loss import CLIPLossState, DirectionalCLIPLoss
from spi_tpu.editing.zssgan import (
    EditingSettings,
    IDE3DZSSGANTrainer,
    ZSSGANTrainer,
)

__all__ = [
    "CLIPLossState",
    "DirectionalCLIPLoss",
    "EditingSettings",
    "IDE3DZSSGANTrainer",
    "ZSSGANTrainer",
]
