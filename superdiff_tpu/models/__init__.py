from superdiff_tpu.models.unet_ref import RefUNet
from superdiff_tpu.models.unet import CondUNet

__all__ = ["RefUNet", "CondUNet"]
