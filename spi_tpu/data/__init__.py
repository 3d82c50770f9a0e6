"""Host-side data pipeline (numpy/PIL; no torch)."""

from spi_tpu.data.dataset import InversionSample, PTIDataset

__all__ = ["InversionSample", "PTIDataset"]
