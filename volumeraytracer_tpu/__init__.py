"""volumeraytracer_tpu — TPU-native differentiable GRIN volume raytracer.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of
PaulStahr/VolumeRaytracer (see SURVEY.md): rays marched through 2D/3D voxel
grids of refractive index, continuously bent by ∇log(n) (eikonal equation,
|v| = n), with absorption, sub-voxel opaque-surface termination, path
recording, scene preprocessing, a harmonic IOR-field solver, serialization
with CLI replay — plus new TPU-first capabilities: a differentiable march
(custom remat'd scan), Pallas forward kernels, camera rendering, and
mesh-sharded multi-chip tracing.
"""

from .types import (
    Options,
    RayInstance,
    RaySceneInstance,
    RaytraceInstance,
    TraceResult,
)
from .models.scene import RaytraceScene, trace_rays_instance
from .models.optical_volume import OpticalVolume

__version__ = "0.1.0"

__all__ = [
    "Options",
    "OpticalVolume",
    "RayInstance",
    "RaySceneInstance",
    "RaytraceInstance",
    "RaytraceScene",
    "TraceResult",
    "trace_rays_instance",
    "__version__",
]
