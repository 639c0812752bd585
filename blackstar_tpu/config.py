"""Scene / camera configuration layer.

YAML schema, field names, and defaults mirror the reference
(``/root/reference/src/ConfigFile.hs:16-84``):

* ``Scene``: stepSize=0.3, bloomStrength=0.4, bloomDivider=25,
  starIntensity=0.7, starSaturation=0.7, diskColor=HSI(0.16,0.1,0.95)
  (YAML hue is degrees and is divided by 360 at parse, ConfigFile.hs:48-54),
  diskOpacity=0, diskInner=3, diskOuter=12, resolution=(1280,720),
  supersampling=false (ConfigFile.hs:66-81).
* ``Camera``: position, lookAt, upVec, fov — all required (ConfigFile.hs:34-38).

TPU-first split: the config is separated into

* ``SceneParams`` — a *differentiable* JAX pytree (camera pose/fov, disk
  radii/opacity/colour, star intensity/saturation, bloom strength, and the
  black-hole mass ``rs``, which the reference hard-codes to 1), and
* ``StaticConfig`` — hashable compile-time facts (resolution, supersampling,
  step size, step count, bloom divider, dtype) so ``jit`` retraces only when
  statics change.

Derived-config rules mirror ``Raytracer.hs:58-63`` (safe distance
``max(50², 2·|camPos|²)``, squared disk radii, 2× resolution under
supersampling) and ``app/Main.hs:93-103`` (preview shrink to a 300-px long
side with supersampling and bloom disabled).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

# ---------------------------------------------------------------------------
# YAML-facing config records (plain Python, float64 like the reference)
# ---------------------------------------------------------------------------

Vec3 = Tuple[float, float, float]

# Defaults per reference ConfigFile.hs:66-81.
_SCENE_DEFAULTS = dict(
    stepSize=0.3,
    bloomStrength=0.4,
    bloomDivider=25,
    starIntensity=0.7,
    starSaturation=0.7,
    diskColor=(0.16, 0.1, 0.95),  # HSI with hue already normalised to [0,1)
    diskOpacity=0.0,
    diskInner=3.0,
    diskOuter=12.0,
    resolution=(1280, 720),
    supersampling=False,
)


@dataclass
class Camera:
    """Pinhole camera (reference ConfigFile.hs:34-38)."""

    position: Vec3
    look_at: Vec3
    up: Vec3
    fov: float  # tangent of the horizontal view half-angle, ×2

    @classmethod
    def from_dict(cls, d: dict) -> "Camera":
        try:
            return cls(
                position=tuple(float(v) for v in d["position"]),
                look_at=tuple(float(v) for v in d["lookAt"]),
                up=tuple(float(v) for v in d["upVec"]),
                fov=float(d["fov"]),
            )
        except KeyError as e:
            raise ValueError(f"camera config missing required key: {e}") from e

    def to_dict(self) -> dict:
        return {
            "position": list(self.position),
            "lookAt": list(self.look_at),
            "upVec": list(self.up),
            "fov": self.fov,
        }


@dataclass
class Scene:
    """Scene settings (reference ConfigFile.hs:20-32, defaults :66-81)."""

    step_size: float = _SCENE_DEFAULTS["stepSize"]
    bloom_strength: float = _SCENE_DEFAULTS["bloomStrength"]
    bloom_divider: int = _SCENE_DEFAULTS["bloomDivider"]
    star_intensity: float = _SCENE_DEFAULTS["starIntensity"]
    star_saturation: float = _SCENE_DEFAULTS["starSaturation"]
    disk_color: Vec3 = _SCENE_DEFAULTS["diskColor"]  # HSI, hue in [0,1)
    disk_opacity: float = _SCENE_DEFAULTS["diskOpacity"]
    disk_inner: float = _SCENE_DEFAULTS["diskInner"]
    disk_outer: float = _SCENE_DEFAULTS["diskOuter"]
    resolution: Tuple[int, int] = _SCENE_DEFAULTS["resolution"]  # (width, height)
    supersampling: bool = _SCENE_DEFAULTS["supersampling"]

    # --- TPU-framework extensions (not in the reference schema) ---
    mass: float = 1.0  # Schwarzschild radius rs; reference hard-codes rs=1
    max_steps: Optional[int] = None  # integration step cap; None -> auto
    dtype: str = "float32"  # compute dtype: float32 (TPU) or float64 (CPU golden)

    @classmethod
    def from_dict(cls, d: dict) -> "Scene":
        d = dict(d or {})
        disk_color = d.pop("diskColor", None)
        if disk_color is not None:
            # YAML stores hue in degrees; normalise /360 (ConfigFile.hs:50-51).
            h, s, i = (float(v) for v in disk_color)
            disk_color = (h / 360.0, s, i)
        else:
            disk_color = _SCENE_DEFAULTS["diskColor"]
        res = d.pop("resolution", _SCENE_DEFAULTS["resolution"])
        max_steps = d.pop("maxSteps", None)
        return cls(
            step_size=float(d.pop("stepSize", _SCENE_DEFAULTS["stepSize"])),
            bloom_strength=float(d.pop("bloomStrength", _SCENE_DEFAULTS["bloomStrength"])),
            bloom_divider=int(d.pop("bloomDivider", _SCENE_DEFAULTS["bloomDivider"])),
            star_intensity=float(d.pop("starIntensity", _SCENE_DEFAULTS["starIntensity"])),
            star_saturation=float(d.pop("starSaturation", _SCENE_DEFAULTS["starSaturation"])),
            disk_color=disk_color,
            disk_opacity=float(d.pop("diskOpacity", _SCENE_DEFAULTS["diskOpacity"])),
            disk_inner=float(d.pop("diskInner", _SCENE_DEFAULTS["diskInner"])),
            disk_outer=float(d.pop("diskOuter", _SCENE_DEFAULTS["diskOuter"])),
            resolution=(int(res[0]), int(res[1])),
            supersampling=bool(d.pop("supersampling", _SCENE_DEFAULTS["supersampling"])),
            mass=float(d.pop("mass", 1.0)),
            max_steps=(int(max_steps) if max_steps is not None else None),
            dtype=str(d.pop("dtype", "float32")),
        )
        # Unknown keys (e.g. the reference animation example's `diskHSV`,
        # animations/default-ani.yaml:12) are ignored, matching aeson `.:?`.

    def to_dict(self) -> dict:
        h, s, i = self.disk_color
        d = {
            "stepSize": self.step_size,
            "bloomStrength": self.bloom_strength,
            "bloomDivider": self.bloom_divider,
            "starIntensity": self.star_intensity,
            "starSaturation": self.star_saturation,
            "diskColor": [h * 360.0, s, i],
            "diskOpacity": self.disk_opacity,
            "diskInner": self.disk_inner,
            "diskOuter": self.disk_outer,
            "resolution": list(self.resolution),
            "supersampling": self.supersampling,
        }
        # TPU-framework extension fields: emitted only when non-default so
        # untouched configs stay byte-compatible with the reference schema,
        # but round-trips (e.g. the animate CLI's per-frame YAMLs) never
        # silently drop them.
        if self.mass != 1.0:
            d["mass"] = self.mass
        if self.max_steps is not None:
            d["maxSteps"] = self.max_steps
        if self.dtype != "float32":
            d["dtype"] = self.dtype
        return d


@dataclass
class Config:
    """Top-level config = scene + camera (reference ConfigFile.hs:16-18)."""

    scene: Scene
    camera: Camera

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        if "camera" not in d:
            raise ValueError("config missing required 'camera' section")
        return cls(
            scene=Scene.from_dict(d.get("scene", {})),
            camera=Camera.from_dict(d["camera"]),
        )

    def to_dict(self) -> dict:
        return {"scene": self.scene.to_dict(), "camera": self.camera.to_dict()}

    # ---- split into (params, static) ----
    def params(self) -> "SceneParams":
        return scene_params(self)

    def static(self, preview: bool = False) -> "StaticConfig":
        return static_config(self, preview=preview)


def config_from_dict(d: dict) -> Config:
    return Config.from_dict(d)


def load_config(path: str) -> Config:
    with open(path) as f:
        d = yaml.safe_load(f)
    if not isinstance(d, dict):
        raise ValueError(f"{path}: expected a YAML mapping at top level")
    return Config.from_dict(d)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)


# ---------------------------------------------------------------------------
# Differentiable parameter pytree
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class CameraParams:
    position: jax.Array  # (3,)
    look_at: jax.Array  # (3,)
    up: jax.Array  # (3,)
    fov: jax.Array  # ()


@jax.tree_util.register_dataclass
@dataclass
class DiskParams:
    inner: jax.Array  # () radius (not squared; squaring is derived state)
    outer: jax.Array  # ()
    opacity: jax.Array  # ()
    color_hsi: jax.Array  # (3,) hue in [0,1)


@jax.tree_util.register_dataclass
@dataclass
class StarParams:
    intensity: jax.Array  # ()
    saturation: jax.Array  # ()


@jax.tree_util.register_dataclass
@dataclass
class SceneParams:
    """All differentiable scene parameters as one pytree."""

    camera: CameraParams
    disk: DiskParams
    stars: StarParams
    bloom_strength: jax.Array  # ()
    mass: jax.Array  # () Schwarzschild radius rs


def scene_params(cfg: Config, dtype: Any = None) -> SceneParams:
    dt = jnp.dtype(dtype or cfg.scene.dtype)
    arr = lambda v: jnp.asarray(v, dtype=dt)
    return SceneParams(
        camera=CameraParams(
            position=arr(cfg.camera.position),
            look_at=arr(cfg.camera.look_at),
            up=arr(cfg.camera.up),
            fov=arr(cfg.camera.fov),
        ),
        disk=DiskParams(
            inner=arr(cfg.scene.disk_inner),
            outer=arr(cfg.scene.disk_outer),
            opacity=arr(cfg.scene.disk_opacity),
            color_hsi=arr(cfg.scene.disk_color),
        ),
        stars=StarParams(
            intensity=arr(cfg.scene.star_intensity),
            saturation=arr(cfg.scene.star_saturation),
        ),
        bloom_strength=arr(cfg.scene.bloom_strength),
        mass=arr(cfg.scene.mass),
    )


def config_with_params(cfg: Config, params: SceneParams) -> Config:
    """Write a (possibly fitted) SceneParams pytree back into a Config —
    the inverse of :func:`scene_params`. Static fields (resolution, flags,
    step cap, dtype) are kept from ``cfg``."""
    import dataclasses

    f = float
    t3 = lambda v: tuple(float(x) for x in v)
    camera = Camera(
        position=t3(params.camera.position),
        look_at=t3(params.camera.look_at),
        up=t3(params.camera.up),
        fov=f(params.camera.fov),
    )
    scene = dataclasses.replace(
        cfg.scene,
        disk_inner=f(params.disk.inner),
        disk_outer=f(params.disk.outer),
        disk_opacity=f(params.disk.opacity),
        disk_color=t3(params.disk.color_hsi),
        star_intensity=f(params.stars.intensity),
        star_saturation=f(params.stars.saturation),
        bloom_strength=f(params.bloom_strength),
        mass=f(params.mass),
    )
    return Config(scene=scene, camera=camera)


# ---------------------------------------------------------------------------
# Static (hashable) compile-time config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class StaticConfig:
    """Everything `jit` should specialise on. Hashable and immutable."""

    width: int  # output width
    height: int  # output height
    render_width: int  # internal render width (2× under supersampling)
    render_height: int
    supersampling: bool
    step_size: float
    max_steps: int
    bloom_divider: int
    disk_on: bool  # diskOpacity != 0 at config time (Raytracer/findColor gate)
    dtype: str = "float32"
    # Config-time fov, used ONLY to pick the star-lookup schedule (grouped
    # vs per-ray) — never in the math, so gradients/fitted fov stay exact.
    fov_hint: float = 0.0

    @property
    def n_rays(self) -> int:
        return self.render_width * self.render_height

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def preview_resolution(width: int, height: int, long_side: int = 300) -> Tuple[int, int]:
    """Preview shrink: cap the long side, preserve aspect (app/Main.hs:96-99)."""
    if width >= height:
        return long_side, long_side * height // width
    return long_side * width // height, long_side


def default_max_steps(cfg: Config) -> int:
    """Static cap on integration steps.

    The reference loops until every ray hits the horizon or escapes past
    ``safeDistance = max(50², 2·|camPos|²)`` with no cap (Raytracer.hs:77-86).
    On TPU the loop length must be static; we bound the travelled path by
    camera distance + twice the escape radius + margin for photon-sphere
    orbits (worst case near r = 1.5·rs), and verify no truncation in tests.
    """
    cam = np.asarray(cfg.camera.position, dtype=np.float64)
    r2cam = float(np.dot(cam, cam))
    # Escape radius and the photon-orbit margin both scale with rs (the
    # photon sphere sits at 1.5·rs, one orbit is ~9.4·rs): a mass-5 scene
    # otherwise truncates ring-winding rays that a mass-1 cap covers.
    mass = float(cfg.scene.mass)
    safe = max((50.0 * mass) ** 2, 2.0 * r2cam)
    r_safe = math.sqrt(safe)
    path = math.sqrt(r2cam) + 2.0 * r_safe + 60.0 * max(1.0, mass)
    return int(math.ceil(path / cfg.scene.step_size))


def static_config(cfg: Config, preview: bool = False) -> StaticConfig:
    w, h = cfg.scene.resolution
    ss = cfg.scene.supersampling
    if preview:
        w, h = preview_resolution(w, h)
        ss = False
    rw, rh = (2 * w, 2 * h) if ss else (w, h)
    return StaticConfig(
        width=w,
        height=h,
        render_width=rw,
        render_height=rh,
        supersampling=ss,
        step_size=float(cfg.scene.step_size),
        max_steps=(
            cfg.scene.max_steps
            if cfg.scene.max_steps is not None
            else default_max_steps(cfg)
        ),
        bloom_divider=int(cfg.scene.bloom_divider),
        disk_on=(cfg.scene.disk_opacity != 0.0),
        dtype=str(cfg.scene.dtype),
        fov_hint=float(cfg.camera.fov),
    )


def apply_preview(cfg: Config) -> Config:
    """Return a preview variant of a config (app/Main.hs:93-103)."""
    w, h = cfg.scene.resolution
    scn = dataclasses.replace(
        cfg.scene,
        resolution=preview_resolution(w, h),
        supersampling=False,
        bloom_strength=0.0,
    )
    return Config(scene=scn, camera=cfg.camera)
