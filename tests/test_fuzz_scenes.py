"""Randomised-scene fuzzing: arbitrary cameras/disks vs the float64 oracle.

Complements the 9 curated golden scenes with seeded random configurations —
odd camera orientations, tilted up-vectors, extreme fovs, thin disks — all
must match the scalar oracle exactly."""

import numpy as np
import pytest

from blackstar_tpu.config import Config
from blackstar_tpu.render import render
from tests import oracle


def _random_config(rng):
    # Camera anywhere outside the photon sphere region, looking vaguely in.
    pos = rng.uniform(-1, 1, 3)
    pos = pos / np.linalg.norm(pos) * rng.uniform(8.0, 40.0)
    look = rng.uniform(-4, 4, 3)
    up = rng.normal(size=3)
    inner = rng.uniform(1.5, 4.0)
    return Config.from_dict(
        {
            "camera": {
                "position": pos.tolist(),
                "lookAt": look.tolist(),
                "upVec": up.tolist(),
                "fov": float(rng.uniform(0.6, 3.0)),
            },
            "scene": {
                "resolution": [10, 6],
                "stepSize": float(rng.uniform(0.15, 0.6)),
                "diskOpacity": float(rng.choice([0.0, rng.uniform(0.2, 1.0)])),
                "diskInner": float(inner),
                "diskOuter": float(inner + rng.uniform(2.0, 12.0)),
                "diskColor": [float(rng.uniform(0, 360)), float(rng.uniform(0, 1)),
                              float(rng.uniform(0.5, 1.1))],
                "dtype": "float64",
            },
        }
    )


@pytest.mark.parametrize("seed", range(6))
def test_random_scene_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    cfg = _random_config(rng)
    got = np.asarray(render(cfg.params(), cfg.static()))
    want = oracle.render(cfg, None)
    np.testing.assert_allclose(got, want, atol=1e-7)
