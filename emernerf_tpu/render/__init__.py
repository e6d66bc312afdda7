from emernerf_tpu.render.prop_sampler import (
    compute_prop_loss,
    proposal_requires_grad_schedule,
    sample_along_rays,
)
from emernerf_tpu.render.volrend import composite_rays
from emernerf_tpu.render.renderer import render_ray_batch

__all__ = [
    "sample_along_rays",
    "compute_prop_loss",
    "proposal_requires_grad_schedule",
    "composite_rays",
    "render_ray_batch",
]
