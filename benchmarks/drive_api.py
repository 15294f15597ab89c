"""End-to-end drive of the public API on the real TPU (verify recipe).

Exercises the package surface as a reference user would: fixed/float scene
tracing, the Pallas kernel path, the CuPy-parity OpticalVolume, harmonic
solver, serialization replay, camera rendering, and error probes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/drive_api.py
"""
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

import volumeraytracer_tpu as vrt
from volumeraytracer_tpu import (
    Options, OpticalVolume, PinholeCamera, RaytraceScene,
    load_instance, save_instance, solve_harmonic, trace_rays_instance,
)

ok = []


def check(name, cond, detail=""):
    ok.append((name, bool(cond)))
    print(f"{'PASS' if cond else 'FAIL'} {name} {detail}", flush=True)


# 1. fixed-mode scene trace on the 100x10x10 ramp
ior = np.clip(np.linspace(1.0, 2.0, 100), 1, 2)[:, None, None] * np.ones((1, 10, 10))
ior = ior.astype(np.float32)
scene = RaytraceScene(ior)
res = scene.trace_rays(
    np.array([[0x10000, 0x40000, 0x40000]], np.uint32),
    np.array([[16, 0, 0]], np.float32),
    invscale=[2] * 3, iterations=10**6, mode="fixed",
)
ratio_fixed = float(res.end_direction[0, 0]) / 16.0
# |v_end|/|v_start| = n(end)/n(start); the start x=1 of the 0..99 ramp has
# n ≈ 1.0101, the endpoint n ≈ 2 → expected ratio ≈ 1.98
check("fixed momentum ratio", abs(ratio_fixed - 2.0 / (1.0 + 1.0 / 99.0)) < 0.01,
      f"{ratio_fixed:.4f}")

# 2. float mode agrees
resf = scene.trace_rays(
    np.array([[1.0, 4.0, 4.0]], np.float32),
    np.array([[16, 0, 0]], np.float32),
    invscale=[2] * 3, iterations=10**6, mode="float",
)
ratio_float = float(resf.end_direction[0, 0]) / 16.0
check("float ratio agrees", abs(ratio_float - ratio_fixed) < 1e-3,
      f"{ratio_float:.4f}")

# 2b. the Pallas kernel path through the scene API.  Gate = the REFERENCE's
# own regression contract for this exact scene (a ~46718-step march through
# the 100-voxel ramp): the optical-momentum ratio at 1e-3 and the iteration
# count within ±100 (cuda_volume_raytracer_test.h:48-52).  Endpoint
# positions are NOT gated tighter than 0.5 voxel: the kernel's ~2^-17
# table quantization drifts the chaotic 46k-step trajectory by ~0.1 voxel
# vs the XLA march — within the physics contract, which pins |v| = n and
# the step count, not the exact endpoint (short-march endpoint parity at
# 1e-5 is separately gated on chip by tpu_verify_lines.py).
resp = scene.trace_rays(
    np.array([[1.0, 4.0, 4.0]], np.float32),
    np.array([[16, 0, 0]], np.float32),
    invscale=[2] * 3, iterations=10**6, mode="float", kernel="pallas",
)
ratio_p = float(resp.end_direction[0, 0]) / 16.0
# the reference asserts |v_end|/|v_start| = n(end)/n(start) at the ray's OWN
# endpoint (cuda_volume_raytracer_test.h:48-49) — comparing two kernels'
# ratios directly would just re-measure their endpoint difference.  n is
# interpolated at pos − 0.5 in the raw grid, the reference's sampling
# convention (image_util.cpp:692-710).
ramp = np.clip(np.linspace(1.0, 2.0, 100), 1, 2)


def n_at(x):
    return float(np.interp(x - 0.5, np.arange(100.0), ramp))


# convention-independent form: each kernel's momentum deviation from the
# SAME n model must agree (the absolute model offset cancels — it is the
# voxel-center convention, identical for both kernels)
dev_p = ratio_p / (n_at(float(resp.end_position[0, 0])) / n_at(1.0))
dev_f = ratio_float / (n_at(float(resf.end_position[0, 0])) / n_at(1.0))
dp = np.abs(np.asarray(resp.end_position) - np.asarray(resf.end_position)).max()
it_d = abs(int(resp.end_iteration[0]) - int(resf.end_iteration[0]))
check(
    "pallas kernel parity",
    abs(dev_p - dev_f) < 1e-3 and it_d <= 100 and dp < 0.5,
    f"momentum dev {dev_p:.5f} vs xla {dev_f:.5f}, pos_err {dp:.2e}, "
    f"iter_diff {it_d}",
)

# 3. CuPy-parity OpticalVolume
vol = OpticalVolume(ior, scale=1.0)
p = np.array([[5.0, 5.0, 5.0]], np.float32)
d = np.array([[10.0, 0.0, 0.0]], np.float32)
it = np.array([10], np.uint32)
for _ in range(1000):
    vol.trace_rays(p, d, it)
    it[:] = 10
n0 = float(vol.get_ior(np.array([[5.0, 5.0, 5.0]], np.float32))[0])
n1 = float(vol.get_ior(p)[0])
r = float(np.linalg.norm(d[0]) / 10.0)
check("OpticalVolume invariant", abs(r - n1 / n0) < 0.02 * r,
      f"|d|ratio {r:.3f} vs n-ratio {n1/n0:.3f}")

# 4. harmonic solver
vals = np.zeros((8, 8, 8), np.float32)
fixed = np.zeros((8, 8, 8), bool)
vals[0] = 1.0
fixed[0] = True
fixed[-1] = True
out = solve_harmonic(vals, is_fixed=fixed, max_iterations=500, max_error=1e-5)
check("harmonic solve", 0.3 < float(np.asarray(out)[4].mean()) < 0.7,
      f"mid {float(np.asarray(out)[4].mean()):.3f}")

# 5. serialization round-trip + replay
with tempfile.NamedTemporaryFile(suffix=".vrt") as f:
    inst = vrt.RaytraceInstance(
        scene=vrt.RaySceneInstance(
            bounds=ior.shape, ior=ior,
            translucency=np.full(ior.shape, 0xFFFFFFFF, np.uint32),
        ),
        rays=vrt.RayInstance(
            start_position=np.array([[0x10000, 0x40000, 0x40000]], np.uint32),
            start_direction=np.array([[16, 0, 0]], np.float32),
            invscale=np.array([2.0] * 3, np.float32),
            iterations=10**6,
        ),
    )
    save_instance(f.name, inst)
    inst2 = load_instance(f.name)
    res2 = trace_rays_instance(inst2.scene, inst2.rays)
    check("serialize replay", abs(float(res2.end_direction[0, 0]) / 16.0 - ratio_fixed) < 1e-6)

# 6. camera render
cam = PinholeCamera(origin=(1.5, 5, 5), forward=(1, 0, 0), up=(0, 0, 1),
                    width=8, height=8, fov=0.1, speed=4.0)
img = vrt.render_image(scene.packed, scene.ior, cam, budget=4000, sigma=0.01)
check("render_image", np.asarray(img["transmittance"]).shape == (8, 8))

# probes: clean errors
errs = 0
for fn in (
    lambda: RaytraceScene(np.zeros((4, 4, 4), np.float32)),           # ior <= 0
    lambda: RaytraceScene(np.ones((5,), np.float32)),                 # 1-D
    lambda: scene.trace_rays(np.zeros((1, 2), np.float32),
                             np.zeros((1, 2), np.float32),
                             invscale=[2] * 3, iterations=10),  # shape
    lambda: load_instance("/dev/null"),                               # bad magic
):
    try:
        fn()
    except (ValueError, Exception) as e:
        errs += isinstance(e, (ValueError, OSError))
check("error probes", errs == 4, f"{errs}/4")

fails = [n for n, c in ok if not c]
print("ALL PASS" if not fails else f"FAILURES: {fails}")
sys.exit(0 if not fails else 1)
