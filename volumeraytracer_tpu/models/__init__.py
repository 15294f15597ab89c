"""User-facing model APIs: scenes, optical volumes, cameras, field solvers."""

from .optical_volume import OpticalVolume
from .scene import RaytraceScene, trace_rays_instance

__all__ = ["OpticalVolume", "RaytraceScene", "trace_rays_instance"]
