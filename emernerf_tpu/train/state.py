"""Training state pytree: all model + proposal parameters and optimizer
moments, donated into the fused train step each iteration."""

from __future__ import annotations

from typing import Any, Tuple

import flax.struct


@flax.struct.dataclass
class TrainState:
    step: Any  # int32 scalar
    params: Any  # RadianceField params
    prop_params: Tuple[Any, ...]  # per-proposal-level DensityField params
    opt_state: Any
    prop_opt_state: Any
