from .blocks import ConvND, ConvTransposeND, DownBlock, InstanceNorm, UpBlock
from .discriminator import Discriminator, build_discriminator
from .generator import UNetGenerator, build_generator, unet_generator
from .utils import InstanceNormalization, downsample, upsample

# NOTE: the reference-named `discriminator` function lives at its reference
# import path, `transfer_em_tpu.models.discriminator.discriminator` — not
# re-exported here because the name would shadow the submodule.

__all__ = [
    "ConvND", "ConvTransposeND", "DownBlock", "InstanceNorm", "UpBlock",
    "Discriminator", "build_discriminator",
    "UNetGenerator", "build_generator", "unet_generator",
    "InstanceNormalization", "downsample", "upsample",
]
