from emernerf_tpu.losses.losses import (
    cycle_consistency_loss,
    depth_loss,
    dynamic_regularization_loss,
    line_of_sight_loss,
    real_value_loss,
    sky_loss_opacity,
    sky_loss_weights,
)

__all__ = [
    "real_value_loss",
    "sky_loss_opacity",
    "sky_loss_weights",
    "depth_loss",
    "line_of_sight_loss",
    "dynamic_regularization_loss",
    "cycle_consistency_loss",
]
