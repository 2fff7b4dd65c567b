from . import augment, convs, losses, normalize, warp

__all__ = ["augment", "convs", "losses", "normalize", "warp"]
