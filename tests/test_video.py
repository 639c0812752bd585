"""Device-resident animation rendering (blackstar_tpu.video)."""

import numpy as np
import pytest

from blackstar_tpu.animation import Animation, Keyframe
from blackstar_tpu.config import Camera, Config, Scene
from blackstar_tpu.imageio import read_png
from blackstar_tpu.render import render
from blackstar_tpu.video import render_animation


def _anim(n_frames=3):
    scene = Scene(
        resolution=(10, 6), disk_opacity=0.9, bloom_strength=0.0,
        max_steps=80, dtype="float32",
    )
    k0 = Keyframe(
        camera=Camera(position=(0, 1, -20), look_at=(0, 0, 0), up=(0, 1, 0), fov=1.5),
        time=0.0,
    )
    k1 = Keyframe(
        camera=Camera(position=(4, 1, -20), look_at=(0, 0, 0), up=(0, 1, 0), fov=2.0),
        time=1.0,
    )
    return Animation(scene=scene, n_frames=n_frames, interpolation="linear",
                     keyframes=[k0, k1])


def test_render_animation_writes_frames(tmp_path):
    anim = _anim(3)
    seen = []
    paths = render_animation(
        anim, str(tmp_path), basename="orbit",
        progress=lambda i, n: seen.append((i, n)),
    )
    assert [p.split("/")[-1] for p in paths] == ["orbit_0.png", "orbit_1.png", "orbit_2.png"]
    assert seen == [(1, 3), (2, 3), (3, 3)]
    imgs = [read_png(p) for p in paths]
    assert all(im.shape == (6, 10, 3) for im in imgs)
    # The camera moves, so consecutive frames must differ.
    assert not np.array_equal(imgs[0], imgs[2])


def test_render_animation_endpoints_match_direct_render(tmp_path):
    """Frame 0 / frame N-1 must equal a direct render at the keyframe cameras."""
    anim = _anim(2)
    paths = render_animation(anim, str(tmp_path), basename="e")
    for idx, kf in [(0, anim.keyframes[0]), (1, anim.keyframes[1])]:
        cfg = Config(scene=anim.scene, camera=kf.camera)
        want = np.asarray(render(cfg.params(), cfg.static()))
        from blackstar_tpu.imageio import write_png

        ref_path = tmp_path / f"want{idx}.png"
        write_png(want, str(ref_path))
        # The animation path sRGB-encodes on device (f32), the reference via
        # the host encoder (f64 pow) — documented to agree to 1 uint8 ulp.
        got = read_png(paths[idx]).astype(np.int16)
        ref = read_png(str(ref_path)).astype(np.int16)
        assert np.abs(got - ref).max() <= 1


def test_render_animation_invalid_keyframes(tmp_path):
    anim = _anim(2)
    anim.keyframes[1].time = 0.5
    with pytest.raises(ValueError):
        render_animation(anim, str(tmp_path))


def test_step_cap_covers_farthest_keyframe(tmp_path):
    """The shared static config must derive its step cap from the farthest
    keyframe, or late zoom-out frames truncate and render black."""
    from blackstar_tpu.config import Config, Scene

    scene = Scene(resolution=(8, 5), disk_opacity=0.9, bloom_strength=0.0,
                  step_size=1.0, dtype="float32")
    near = Keyframe(
        camera=Camera(position=(0, 1, -20), look_at=(0, 0, 0), up=(0, 1, 0), fov=1.5),
        time=0.0,
    )
    far = Keyframe(
        camera=Camera(position=(0, 1, -90), look_at=(0, 0, 0), up=(0, 1, 0), fov=1.5),
        time=1.0,
    )
    anim = Animation(scene=scene, n_frames=2, interpolation="linear",
                     keyframes=[near, far])
    paths = render_animation(anim, str(tmp_path), basename="zoom")
    # The last frame must equal a direct render of the far camera with its
    # own (sufficient) derived cap.
    direct_cfg = Config(scene=scene, camera=far.camera)
    want = np.asarray(render(direct_cfg.params(), direct_cfg.static()))
    from blackstar_tpu.imageio import write_png

    ref = tmp_path / "want.png"
    write_png(want, str(ref))
    got = read_png(paths[1]).astype(np.int16)
    ref8 = read_png(str(ref)).astype(np.int16)
    assert np.abs(got - ref8).max() <= 1
