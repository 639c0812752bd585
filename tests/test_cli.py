"""CLI drivers: animate expansion, generate-grid round-trip, render
(preview, batch, force/overwrite), and the dispatcher."""

import os

import numpy as np
import pytest
import yaml

from blackstar_tpu.__main__ import main as dispatch_main
from blackstar_tpu.cli.animate import main as animate_main
from blackstar_tpu.cli.generate_grid import main as grid_main
from blackstar_tpu.cli.render import main as render_main


def _write_animation(path, n_frames=4):
    anim = {
        "scene": {"resolution": [8, 5], "diskOpacity": 0.9, "maxSteps": 60,
                  "bloomStrength": 0.0, "dtype": "float32"},
        "nFrames": n_frames,
        "interpolation": "linear",
        "keyframes": [
            {"time": 0, "camera": {"position": [0, 1, -20], "lookAt": [0, 0, 0],
                                   "upVec": [0, 1, 0], "fov": 1.5}},
            {"time": 1, "camera": {"position": [5, 1, -20], "lookAt": [0, 0, 0],
                                   "upVec": [0, 1, 0], "fov": 2.0}},
        ],
    }
    with open(path, "w") as f:
        yaml.safe_dump(anim, f)


def _write_scene(path, **scene):
    scene = {"resolution": [8, 5], "maxSteps": 60, "bloomStrength": 0.0,
             "dtype": "float32", **scene}
    cfg = {
        "camera": {"position": [0, 1, -20], "lookAt": [0, 0, 0],
                   "upVec": [0, 1, 0], "fov": 1.5},
        "scene": scene,
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)


class TestAnimate:
    def test_expands_frames(self, tmp_path):
        anim_path = tmp_path / "orbit.yaml"
        _write_animation(anim_path, n_frames=4)
        out = tmp_path / "frames"
        assert animate_main([str(anim_path), "-o", str(out), "--force"]) == 0
        files = sorted(os.listdir(out))
        assert files == ["orbit_0.yaml", "orbit_1.yaml", "orbit_2.yaml", "orbit_3.yaml"]
        first = yaml.safe_load((out / "orbit_0.yaml").read_text())
        last = yaml.safe_load((out / "orbit_3.yaml").read_text())
        assert first["camera"]["position"][0] == pytest.approx(0.0)
        assert last["camera"]["position"][0] == pytest.approx(5.0)
        assert last["camera"]["fov"] == pytest.approx(2.0)

    def test_invalid_keyframes_rejected(self, tmp_path, capsys):
        anim_path = tmp_path / "bad.yaml"
        _write_animation(anim_path)
        d = yaml.safe_load(anim_path.read_text())
        d["keyframes"][1]["time"] = 0.9
        anim_path.write_text(yaml.safe_dump(d))
        assert animate_main([str(anim_path), "-o", str(tmp_path / "x"), "--force"]) == 1

    def test_missing_input(self, tmp_path):
        assert animate_main([str(tmp_path / "nope.yaml")]) == 1


class TestGenerateGrid:
    def test_round_trip(self, tmp_path):
        from blackstar_tpu.stars.catalog import encode_ppm
        from blackstar_tpu.stars.grid import load_star_grid

        rng = np.random.default_rng(0)
        n = 50
        ppm = tmp_path / "cat.ppm"
        ppm.write_bytes(
            encode_ppm(
                ra=rng.uniform(0, 2 * np.pi, n),
                dec=rng.uniform(-np.pi / 2, np.pi / 2, n),
                spectral=["G"] * n,
                mag=rng.integers(500, 1200, n),
            )
        )
        out = tmp_path / "stars.grid.npz"
        assert grid_main([str(ppm), str(out), "--force"]) == 0
        grid = load_star_grid(str(out))
        assert grid.n_stars == n

    def test_missing_catalog(self, tmp_path):
        assert grid_main([str(tmp_path / "no.ppm"), str(tmp_path / "o.npz")]) == 1

    def test_cli_defaults_match_production_artifact(self):
        # Regression: the CLI once defaulted to 0.02 while the library's
        # measured-optimal default was 0.008 (VERDICT r1 weak #5); later
        # it defaulted to the margin-0 build, which silently disables the
        # grouped production lookup on user-rebuilt grids. Pin the CLI to
        # the committed artifact's production build parameters.
        from blackstar_tpu.cli.generate_grid import build_parser
        from blackstar_tpu.stars import artifact

        p = build_parser()
        assert p.get_default("cell_size") == artifact.CELL_SIZE
        assert p.get_default("radius") == artifact.RADIUS
        assert p.get_default("k0") == artifact.K0

    def test_cli_built_grid_has_group_margin(self, tmp_path):
        from blackstar_tpu.stars.catalog import encode_ppm
        from blackstar_tpu.stars.grid import load_star_grid

        rng = np.random.default_rng(7)
        n = 50
        ppm = tmp_path / "m.ppm"
        ppm.write_bytes(
            encode_ppm(
                ra=rng.uniform(0, 2 * np.pi, n),
                dec=rng.uniform(-np.pi / 2, np.pi / 2, n),
                spectral=["B"] * n,
                mag=rng.integers(500, 1200, n),
            )
        )
        out = tmp_path / "m.grid.npz"
        assert grid_main([str(ppm), str(out), "--force"]) == 0
        grid = load_star_grid(str(out))
        assert grid.margin > 0.0  # grouped lookup enabled


class TestRender:
    def test_single_scene(self, tmp_path):
        scn = tmp_path / "tiny.yaml"
        _write_scene(scn, diskOpacity=0.9)
        out = tmp_path / "out"
        assert render_main([str(scn), "-o", str(out), "--force",
                            "--starmap", str(tmp_path / "absent.npz")]) == 0
        assert (out / "tiny.png").exists()

    def test_preview_prefix(self, tmp_path):
        scn = tmp_path / "tiny.yaml"
        _write_scene(scn, diskOpacity=0.9, resolution=[20, 10])
        out = tmp_path / "out"
        assert render_main([str(scn), "-o", str(out), "--force", "--preview",
                            "--starmap", str(tmp_path / "absent.npz")]) == 0
        assert (out / "prev-tiny.png").exists()
        from blackstar_tpu.imageio import read_png

        img = read_png(str(out / "prev-tiny.png"))
        assert img.shape == (150, 300, 3)

    def test_batch_directory(self, tmp_path):
        scenes = tmp_path / "scenes"
        scenes.mkdir()
        _write_scene(scenes / "a.yaml", diskOpacity=0.9)
        _write_scene(scenes / "b.yaml", diskOpacity=0.0)
        (scenes / "broken.yaml").write_text("scene: [not, a, mapping\n")
        out = tmp_path / "out"
        assert render_main([str(scenes), "-o", str(out), "--force",
                            "--starmap", str(tmp_path / "absent.npz")]) == 0
        assert (out / "a.png").exists() and (out / "b.png").exists()

    def test_shard_scenes(self, tmp_path):
        scenes = tmp_path / "scenes"
        scenes.mkdir()
        for name in ("a", "b", "c", "d"):
            _write_scene(scenes / f"{name}.yaml", diskOpacity=0.9)
        out = tmp_path / "out"
        assert render_main([str(scenes), "-o", str(out), "--force",
                            "--shard-scenes", "1/2",
                            "--starmap", str(tmp_path / "absent.npz")]) == 0
        assert sorted(os.listdir(out)) == ["b.png", "d.png"]

    def test_resume_skips_existing(self, tmp_path):
        scn = tmp_path / "tiny.yaml"
        _write_scene(scn, diskOpacity=0.9)
        out = tmp_path / "out"
        out.mkdir()
        (out / "tiny.png").write_bytes(b"placeholder")
        assert render_main([str(scn), "-o", str(out), "--force", "--resume",
                            "--starmap", str(tmp_path / "absent.npz")]) == 0
        # Existing output untouched.
        assert (out / "tiny.png").read_bytes() == b"placeholder"

    def test_bloom_applied(self, tmp_path):
        scn = tmp_path / "glow.yaml"
        _write_scene(scn, diskOpacity=0.9, bloomStrength=0.5, bloomDivider=4)
        out = tmp_path / "out"
        assert render_main([str(scn), "-o", str(out), "--force",
                            "--starmap", str(tmp_path / "absent.npz")]) == 0
        assert (out / "glow.png").exists()


class TestDispatcher:
    def test_help(self, capsys):
        assert dispatch_main(["--help"]) == 0
        assert "render" in capsys.readouterr().out

    def test_unknown(self, capsys):
        assert dispatch_main(["frobnicate"]) == 2

    def test_dispatch_animate(self, tmp_path):
        anim_path = tmp_path / "a.yaml"
        _write_animation(anim_path, n_frames=2)
        out = tmp_path / "frames"
        assert dispatch_main(["animate", str(anim_path), "-o", str(out), "--force"]) == 0
        assert len(os.listdir(out)) == 2


class TestFit:
    def test_fit_recovers_toward_target(self, tmp_path):
        """Render a truth scene, perturb diskOuter, fit it back via the CLI."""
        import blackstar_tpu as bs

        truth = tmp_path / "truth.yaml"
        _write_scene(truth, diskOpacity=0.95, diskOuter=12.0, resolution=[16, 9])
        cfg = bs.load_config(str(truth))
        img = bs.render_image(cfg)
        target = tmp_path / "target.png"
        bs.write_png(img, str(target))

        guess = tmp_path / "guess.yaml"
        _write_scene(guess, diskOpacity=0.95, diskOuter=10.0, resolution=[16, 9])
        out = tmp_path / "fitted.yaml"
        from blackstar_tpu.cli.fit import main as fit_main

        assert fit_main([str(guess), str(target), "-o", str(out), "--steps", "25",
                         "--lr", "0.05", "--fit", "disk.outer", "--force"]) == 0
        fitted = yaml.safe_load(out.read_text())
        # diskOuter moved from 10 toward the truth 12; everything else intact.
        assert 10.2 < fitted["scene"]["diskOuter"] < 13.0
        assert fitted["scene"]["diskOpacity"] == pytest.approx(0.95)
        assert fitted["camera"]["fov"] == pytest.approx(1.5)

    def test_fit_rejects_size_mismatch(self, tmp_path, capsys):
        import blackstar_tpu as bs

        scn = tmp_path / "s.yaml"
        _write_scene(scn, resolution=[8, 5])
        cfg = bs.load_config(str(scn))
        img = bs.render_image(cfg)
        target = tmp_path / "t.png"
        bs.write_png(img[:3, :4], str(target))  # wrong size
        from blackstar_tpu.cli.fit import main as fit_main

        assert fit_main([str(scn), str(target), "--steps", "1", "--force"]) == 1
        assert "resolution" in capsys.readouterr().out


def test_animate_render_with_starmap(tmp_path):
    """Regression: animate --render with an existing starmap must resolve
    the per-dtype grid cache to a real StarGrid (it used to crash)."""
    import jax.numpy as jnp
    import numpy as np

    from blackstar_tpu.stars.catalog import Catalog
    from blackstar_tpu.stars.grid import build_star_grid, save_star_grid

    rng = np.random.default_rng(3)
    pos = rng.normal(size=(200, 3)); pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
    grid = build_star_grid(
        Catalog(pos=pos, mag=rng.integers(600, 1200, 200).astype(np.int32),
                hue=np.full(200, 0.094), sat=np.full(200, 0.29)),
        dtype=np.float64, device=False,
    )
    starmap = save_star_grid(grid, str(tmp_path / "stars.grid"))

    anim_path = tmp_path / "orbit.yaml"
    _write_animation(anim_path, n_frames=2)
    out = tmp_path / "frames"
    assert animate_main([str(anim_path), "-o", str(out), "--force", "--render",
                         "--starmap", starmap]) == 0
    assert sorted(os.listdir(out)) == ["orbit_0.png", "orbit_1.png"]


def test_render_single_scene_failure_exits_nonzero(tmp_path):
    scn = tmp_path / "broken.yaml"
    scn.write_text("scene: [not, a, mapping\n")
    assert render_main([str(scn), "-o", str(tmp_path / "out"), "--force",
                        "--starmap", str(tmp_path / "absent.npz")]) == 1


def test_star_grid_cache_serves_scene_dtype(tmp_path):
    """A float64 scene must get float64 star data through the render CLI's
    per-dtype cache (regression: the grid used to be loaded as f32 once)."""
    import jax.numpy as jnp
    import numpy as np

    from blackstar_tpu.cli.render import _load_stars
    from blackstar_tpu.stars.catalog import Catalog
    from blackstar_tpu.stars.grid import build_star_grid, save_star_grid

    rng = np.random.default_rng(11)
    pos = rng.normal(size=(50, 3)); pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
    grid = build_star_grid(
        Catalog(pos=pos, mag=np.full(50, 900, np.int32),
                hue=np.full(50, 0.094), sat=np.full(50, 0.29)),
        dtype=np.float64, device=False,
    )
    path = save_star_grid(grid, str(tmp_path / "s.grid"))
    cache = _load_stars(path)
    g64 = cache.get(jnp.float64)
    g32 = cache.get(jnp.float32)
    assert g64.dtype == jnp.float64 and g32.dtype == jnp.float32
    # Full precision survived the round trip (not f32-rounded-then-upcast).
    np.testing.assert_array_equal(np.asarray(g64.cell_data), grid.cell_data)
    assert cache.get(jnp.float64) is g64  # cached
