from evoworld_tpu.models.unet import UNetSpatioTemporal, UNetConfig

__all__ = ["UNetSpatioTemporal", "UNetConfig"]
