from .blocks import ConvND, ConvTransposeND, DownBlock, InstanceNorm, UpBlock
from .discriminator import Discriminator, build_discriminator
from .generator import UNetGenerator, build_generator

__all__ = [
    "ConvND", "ConvTransposeND", "DownBlock", "InstanceNorm", "UpBlock",
    "Discriminator", "build_discriminator",
    "UNetGenerator", "build_generator",
]
