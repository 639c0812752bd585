"""Animation layer: keyframe validation, interpolation semantics, frame
expansion, and filename padding (reference Animation.hs + app/Animate.hs)."""

import numpy as np
import pytest

from blackstar_tpu.animation import (
    Animation,
    Keyframe,
    camera_at,
    frame_filename,
    generate_frames,
    interpolate,
    load_animation,
    pad_zero,
    validate_keyframes,
)
from blackstar_tpu.config import Camera, Scene


def _kf(t, px=0.0, fov=1.5):
    return Keyframe(
        camera=Camera(position=(px, 0, -20), look_at=(0, 0, 0), up=(0, 1, 0), fov=fov),
        time=t,
    )


class TestValidate:
    def test_too_few(self):
        with pytest.raises(ValueError, match="at least two"):
            validate_keyframes([_kf(0.0)])
        with pytest.raises(ValueError, match="at least two"):
            validate_keyframes([])

    def test_bad_endpoints(self):
        with pytest.raises(ValueError, match="time == 0"):
            validate_keyframes([_kf(0.1), _kf(1.0)])
        with pytest.raises(ValueError, match="time == 0"):
            validate_keyframes([_kf(0.0), _kf(0.9)])

    def test_ok(self):
        validate_keyframes([_kf(0.0), _kf(0.5), _kf(1.0)])


class TestInterpolate:
    def test_linear_between(self):
        cam = interpolate([_kf(0.0, px=0.0, fov=1.0), _kf(1.0, px=10.0, fov=3.0)], 0.25)
        assert cam.position[0] == pytest.approx(2.5)
        assert cam.fov == pytest.approx(1.5)

    def test_multi_segment_bracketing(self):
        frames = [_kf(0.0, px=0.0), _kf(0.5, px=10.0), _kf(1.0, px=0.0)]
        assert interpolate(frames, 0.25).position[0] == pytest.approx(5.0)
        assert interpolate(frames, 0.75).position[0] == pytest.approx(5.0)
        # Half-open bracket: t exactly at a keyframe takes the next segment.
        assert interpolate(frames, 0.5).position[0] == pytest.approx(10.0)

    def test_final_frame_exact(self):
        """t=1 falls past the last half-open bracket; the reference extends
        the final keyframe (Animation.hs:64-65) so the last frame is exact."""
        frames = [_kf(0.0, px=0.0), _kf(1.0, px=7.0)]
        assert interpolate(frames, 1.0).position[0] == pytest.approx(7.0)


class TestGenerateFrames:
    def test_count_and_endpoints(self):
        anim = Animation(
            scene=Scene(),
            n_frames=5,
            interpolation="linear",
            keyframes=[_kf(0.0, px=0.0, fov=1.0), _kf(1.0, px=8.0, fov=2.0)],
        )
        frames = generate_frames(anim)
        assert len(frames) == 5
        assert frames[0].camera.position[0] == pytest.approx(0.0)
        assert frames[-1].camera.position[0] == pytest.approx(8.0)
        assert frames[2].camera.position[0] == pytest.approx(4.0)
        # Scene constant across frames (Animation.hs:54-59).
        assert all(f.scene is anim.scene for f in frames)

    def test_unsorted_keyframes_are_sorted(self):
        anim = Animation(
            scene=Scene(),
            n_frames=3,
            interpolation="linear",
            keyframes=[_kf(1.0, px=8.0), _kf(0.0, px=0.0)],
        )
        frames = generate_frames(anim)
        assert frames[1].camera.position[0] == pytest.approx(4.0)


def test_camera_at_matches_scalar_interpolate():
    frames = [_kf(0.0, px=0.0, fov=1.0), _kf(0.4, px=10.0, fov=2.0), _kf(1.0, px=-5.0, fov=1.2)]
    ts = np.linspace(0.0, 1.0, 11)
    batched = camera_at(frames, ts)
    for i, t in enumerate(ts):
        want = interpolate(frames, float(t))
        np.testing.assert_allclose(np.asarray(batched.position[i]), want.position, atol=1e-12)
        np.testing.assert_allclose(float(batched.fov[i]), want.fov, atol=1e-12)


class TestPadding:
    def test_pad_zero(self):
        assert pad_zero(374, 0) == "000"
        assert pad_zero(374, 42) == "042"
        assert pad_zero(374, 374) == "374"
        assert pad_zero(9, 3) == "3"

    def test_frame_filename(self):
        assert frame_filename("orbit", 375, 7) == "orbit_007.yaml"


def test_load_example_animation():
    anim = load_animation("animations/default-ani.yaml")
    assert anim.n_frames == 375
    assert len(anim.keyframes) == 2
    validate_keyframes(anim.keyframes)
    # diskHSV is an unknown key and must be ignored (default diskColor applies).
    assert anim.scene.disk_color == (0.16, 0.1, 0.95)
    frames = generate_frames(anim)
    assert len(frames) == 375
