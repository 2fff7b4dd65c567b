"""Single dataclass config with JSON round-trip.

The reference scatters its knobs across keyword args and module constants
(cgan.py:40, datasets/datasets.py:10-12, models/generator.py:18-20); SURVEY.md
§5 prescribes one dataclass-based config preserving them all.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass
class CycleGANConfig:
    """Model + training hyperparameters (reference EM2EM.__init__, cgan.py:40)."""

    dimsize: int = 74
    is3d: bool = True
    wf: int = 8
    focal_gamma: float = 2.0
    use_norm: bool = False          # norm_type is DEPRECATED/disabled upstream
    learning_rate: float = 2e-4
    adam_beta1: float = 0.5
    compute_dtype: str = "float32"  # "bfloat16" for full MXU rate on TPU
    fast_conv: bool = False         # experimental Pallas Toeplitz conv (PERF.md)
    remat: bool = False             # rematerialize generator applies in the
    # train step (jax.checkpoint): trades recompute for activation memory,
    # unlocking larger batches (PERF.md "remat" section)
    ensemble_apps: bool = False     # stack G/F (and Dx/Dy) param trees and
    # run each train-step round as one vmapped apply (grouped convs, half
    # the program count) — see cyclegan_losses(ensemble_apps=...)
    dropout_impl: str = "rbg8"      # dropout-mask generator: "rbg8" draws
    # one uint8/element from the TPU-native XLA RngBitGenerator (measured
    # ~zero cost — the mask fuses into the convT epilogue), "ref" keeps
    # threefry bernoulli (the masks the rounds-1/2 records were trained
    # with; +35-80% on each up-block convT, PERF.md lever-4 closure).
    # Statistically identical iid Bernoulli(0.5) masks either way.
    accum_steps: int = 1            # gradient accumulation: split each batch
    # into this many microbatches, lax.scan the backward over them, and apply
    # ONE optimizer update from the averaged gradients.  Peak activation
    # memory scales with the microbatch, so effective batches beyond HBM
    # become reachable; with the per-sample-mean losses the averaged gradient
    # equals the full-batch gradient exactly (tests/test_train.py)
    # dataset knobs (reference datasets.py:10-12)
    batch_size: int = 64
    epoch_size: int = 4096
    buffer_size: int = 4096

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "CycleGANConfig":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass
class ExportMeta:
    """meta.json contract for exported generators (reference utils.py:158-166)."""

    buffer: int
    outdimsize: int
    meanstd_x: Tuple[float, float]
    meanstd_y: Tuple[float, float]
    dimsize: int = 74
    is3d: bool = True
    wf: int = 8

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["meanstd_x"] = list(self.meanstd_x)
        d["meanstd_y"] = list(self.meanstd_y)
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "ExportMeta":
        d = json.loads(s)
        known = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in known}
        d["meanstd_x"] = tuple(d["meanstd_x"])
        d["meanstd_y"] = tuple(d["meanstd_y"])
        return cls(**d)
