"""Serialization round-trip tests (≙ serialize_test.h:10-21: round-trip a
tiny scene instance and compare ==) plus replay-through-trace equality."""

import numpy as np

from volumeraytracer_tpu import (
    RayInstance,
    RaySceneInstance,
    RaytraceInstance,
    trace_rays_instance,
)
from volumeraytracer_tpu.utils import serialization as ser


def tiny_instance() -> RaytraceInstance:
    scene = RaySceneInstance(
        bounds=(5, 5, 5),
        ior=np.linspace(1.0, 2.0, 125).astype(np.float32).reshape(5, 5, 5),
        translucency=np.full((5, 5, 5), 0xFFFFFFFF, np.uint32),
    )
    rays = RayInstance(
        start_position=np.array([[0x18000, 0x20000, 0x20000]], np.uint32),
        start_direction=np.array([[4.0, 0.0, 0.0]], np.float32),
        invscale=np.array([2.0, 2.0, 2.0], np.float32),
        minimum_brightness=0,
        iterations=100,
        trace_path=False,
        normalize_length=True,
    )
    return RaytraceInstance(scene, rays)


def test_npz_roundtrip(tmp_path):
    inst = tiny_instance()
    p = tmp_path / "inst.npz"
    ser.save_instance(p, inst)
    back = ser.load_instance(p)
    assert back == inst


def test_npz_roundtrip_non_npz_suffix(tmp_path):
    """np.savez appends ".npz" to unknown suffixes when given a path;
    save_instance must write the EXACT path (regression: save to x.vrt
    produced x.vrt.npz and load_instance(x.vrt) failed)."""
    inst = tiny_instance()
    p = tmp_path / "inst.vrt"
    ser.save_instance(p, inst)
    assert p.exists() and not (tmp_path / "inst.vrt.npz").exists()
    assert ser.load_instance(p) == inst


def test_binary_roundtrip():
    inst = tiny_instance()
    back = ser.loads_binary(ser.dumps_binary(inst))
    assert back == inst


def test_scene_and_ray_roundtrip(tmp_path):
    inst = tiny_instance()
    ps, pr = tmp_path / "scene.npz", tmp_path / "rays.npz"
    ser.save_scene_instance(ps, inst.scene)
    ser.save_ray_instance(pr, inst.rays)
    assert ser.load_scene_instance(ps) == inst.scene
    assert ser.load_ray_instance(pr) == inst.rays


def test_replay_matches_direct():
    """Replaying a serialized instance reproduces the original trace —
    the debug-capture workflow (python_binding.cpp:21-34, raytrace_test.cpp)."""
    inst = tiny_instance()
    direct = trace_rays_instance(inst.scene, inst.rays)
    back = ser.loads_binary(ser.dumps_binary(inst))
    replay = trace_rays_instance(back.scene, back.rays)
    np.testing.assert_array_equal(
        np.asarray(direct.end_position), np.asarray(replay.end_position)
    )
    np.testing.assert_array_equal(
        np.asarray(direct.end_direction), np.asarray(replay.end_direction)
    )


def test_write_instance_capture_and_replay(tmp_path):
    """Options.write_instance dumps a replayable instance from trace_rays
    (≙ python_binding.cpp:21-34 always / java_binding.cpp:119-124 on-flag);
    replaying the dump through the CLI path reproduces the trace."""
    from volumeraytracer_tpu import Options, RaytraceScene
    from volumeraytracer_tpu import cli

    inst = tiny_instance()
    dump = tmp_path / "debug_raytrace_instance.npz"
    scene = RaytraceScene(
        inst.scene.ior, inst.scene.translucency,
        Options(write_instance=str(dump)),
    )
    direct = scene.trace_rays(
        inst.rays.start_position, inst.rays.start_direction,
        invscale=inst.rays.invscale, iterations=inst.rays.iterations,
    )
    assert dump.exists()
    back = ser.load_instance(dump)
    assert back == inst
    replay = trace_rays_instance(back.scene, back.rays)
    np.testing.assert_array_equal(
        np.asarray(direct.end_position), np.asarray(replay.end_position)
    )
    # the CLI replays the same dump end-to-end (≙ raytrace_test.cpp:33-72)
    assert cli.main([str(dump), "--loglevel", "-1"]) == 0


def test_write_instance_default_path(tmp_path, monkeypatch):
    """write_instance=True uses the reference's default CWD filename."""
    from volumeraytracer_tpu import Options, RaytraceScene

    monkeypatch.chdir(tmp_path)
    inst = tiny_instance()
    scene = RaytraceScene(
        inst.scene.ior, inst.scene.translucency, Options(write_instance=True)
    )
    scene.trace_rays(
        inst.rays.start_position, inst.rays.start_direction,
        invscale=inst.rays.invscale, iterations=inst.rays.iterations,
    )
    assert (tmp_path / "debug_raytrace_instance.npz").exists()
