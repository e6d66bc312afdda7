from emernerf_tpu.data.rays import get_rays
from emernerf_tpu.data.scene import SceneTensors

__all__ = ["get_rays", "SceneTensors"]
