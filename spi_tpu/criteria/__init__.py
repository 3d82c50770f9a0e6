"""Losses and metrics.

Specs: spi/criteria/ (LPIPS, ID, L2, TV, BoxCX) plus the StyleGAN
projector's noise regularizer and VGG feature distance
(spi/training/projectors/w_projector.py:48-51,90-99).
"""

from spi_tpu.criteria.l2_loss import l2_loss
from spi_tpu.criteria.lpips import LPIPS
from spi_tpu.criteria.noise_reg import noise_regularization
from spi_tpu.criteria.tv_loss import tv_loss

__all__ = ["l2_loss", "LPIPS", "noise_regularization", "tv_loss"]
