from .export import (export_generator, load_generator,
                     predict_cube_from_saved_model, save_model)
from .tiling import (TilePlan, make_tile_step, plan_tiles, predict_ng_cube,
                     predict_tiled, scatter_tiles)

__all__ = [
    "export_generator", "load_generator", "predict_cube_from_saved_model",
    "save_model", "TilePlan", "make_tile_step", "plan_tiles",
    "predict_ng_cube", "predict_tiled", "scatter_tiles",
]
