"""Scalar float64 oracle: a direct, per-pixel implementation of the
reference renderer's semantics (flannelhead/blackstar), used as the golden
baseline for the vectorised TPU framework. Deliberately written in plain
Python loops with no JAX so that correctness is independent of the code under
test.

Semantics covered (file:line refer to /root/reference):
  camera rays       src/Raytracer.hs:40-51
  RK4 + march loop  src/Raytracer.hs:69-134
  classification    src/Raytracer.hs:88-102
  disk shading      src/Raytracer.hs:104-111
  star lookup       src/StarMap.hs:93-115 (brute force over all stars)
  HSI->RGB          Graphics.ColorSpace HSI model
  box blur/bloom    src/ImageFilters.hs:28-86 (naive windowed sum)
  supersample       src/ImageFilters.hs:88-97
  sRGB              src/Raytracer.hs:23-27
"""

from __future__ import annotations

import math

import numpy as np


def normalize(v):
    return v / np.linalg.norm(v)


def look_at_m33(eye, center, up):
    za = normalize(center - eye)
    xa = normalize(np.cross(za, up))
    ya = np.cross(xa, za)
    return np.stack([xa, ya, -za])


def generate_ray(camera, width, height, x, y):
    pos = np.asarray(camera.position, np.float64)
    m = look_at_m33(pos, np.asarray(camera.look_at, np.float64), np.asarray(camera.up, np.float64))
    fov = camera.fov
    d = m.T @ np.array(
        [fov * (x / width - 0.5), fov * (0.5 - y / height) * height / width, -1.0]
    )
    return normalize(d), pos.copy()


def hsi_to_rgb(h, s, i):
    """Scalar HSI->RGB, hue in [0,1)."""
    hp = (h * 2.0 * math.pi)
    is_ = i * s
    second = i - is_

    def first(a):
        return i + is_ * math.cos(a) / math.cos(math.pi / 3.0 - a)

    if hp < 2.0 * math.pi / 3.0:
        f = first(hp)
        return np.array([f, 2 * i + is_ - f, second])
    if hp < 4.0 * math.pi / 3.0:
        f = first(hp - 2.0 * math.pi / 3.0)
        return np.array([second, f, 2 * i + is_ - f])
    f = first(hp - 4.0 * math.pi / 3.0)
    return np.array([2 * i + is_ - f, second, f])


def rk4(h, h2, vel, pos, mass=1.0):
    def f(v, p):
        r2 = p @ p
        r5 = r2 * r2 * math.sqrt(r2)
        return (-1.5 * mass * h2 / r5) * p, v

    k1v, k1p = f(vel, pos)
    k2v, k2p = f(vel + (h / 2) * k1v, pos + (h / 2) * k1p)
    k3v, k3p = f(vel + (h / 2) * k2v, pos + (h / 2) * k2p)
    k4v, k4p = f(vel + h * k3v, pos + h * k3p)
    return (
        vel + (h / 6) * (k1v + 2 * k2v + 2 * k3v + k4v),
        pos + (h / 6) * (k1p + 2 * k2p + 2 * k3p + k4p),
    )


def star_lookup(stars, intensity, saturation, vel):
    """Brute-force starLookup (StarMap.hs:93-115). `stars` is a Catalog or
    None; returns linear RGB."""
    out = np.zeros(3)
    if stars is None or stars.pos.shape[0] == 0:
        return out
    max_brightness, dynamic, w = 950.0, 50.0, 0.0005
    nvel = normalize(vel)
    a = math.log(2.0) / dynamic
    for p, mag, hue, sat in zip(stars.pos, stars.mag, stars.hue, stars.sat):
        d = p - nvel
        d2 = d @ d
        if d2 <= (3 * w) ** 2:
            val = intensity * min(
                1.0, math.exp(a * (max_brightness - float(mag)) - d2 / (2 * w * w))
            )
            out = out + hsi_to_rgb(hue, saturation * sat, val)
    return np.minimum(out, 1.0)


def blend(top, bottom):
    return top + bottom * (1.0 - top[3])


def disk_color(scene, disk_rgb, r):
    r_inner, r_outer = scene.disk_inner, scene.disk_outer
    intensity = math.sin(math.pi * ((r_outer - r) / (r_outer - r_inner)) ** 2)
    return np.array([*(disk_rgb * intensity), intensity * scene.disk_opacity])


def trace_pixel(cfg, stars, width, height, x, y, max_steps=100000):
    """Full colorize loop for one pixel (Raytracer.hs:69-102)."""
    scene = cfg.scene
    vel, pos = generate_ray(cfg.camera, width, height, x, y)
    cr = np.cross(pos, vel)
    h2 = cr @ cr
    cam_pos = np.asarray(cfg.camera.position, np.float64)
    safe = max((50.0 * scene.mass) ** 2, 2.0 * (cam_pos @ cam_pos))
    inner2 = scene.disk_inner**2
    outer2 = scene.disk_outer**2
    rs2 = scene.mass**2
    disk_rgb = hsi_to_rgb(*scene.disk_color)
    h = scene.step_size

    acc = np.zeros(4)
    for _ in range(max_steps):
        new_vel, new_pos = rk4(h, h2, vel, pos, scene.mass)
        r2 = pos @ pos
        if r2 < rs2:
            bottom = np.array([0.0, 0.0, 0.0, 1.0])
            return blend(acc, bottom)[:3]
        if r2 > safe:
            srgb = star_lookup(stars, scene.star_intensity, scene.star_saturation, vel)
            return blend(acc, np.array([*srgb, 1.0]))[:3]
        y0, y1 = pos[1], new_pos[1]
        if scene.disk_opacity != 0 and np.sign(y1) != np.sign(y0):
            r2n = new_pos @ new_pos
            r2ave = (y1 * r2 - y0 * r2n) / (y1 - y0)
            if inner2 < r2ave < outer2:
                acc = blend(acc, disk_color(scene, disk_rgb, math.sqrt(r2ave)))
        vel, pos = new_vel, new_pos
    return blend(acc, np.array([0.0, 0.0, 0.0, 1.0]))[:3]  # truncated -> black


def render(cfg, stars=None):
    """Oracle render incl. supersampling (Raytracer.hs:53-67)."""
    scene = cfg.scene
    w, h = scene.resolution
    rw, rh = (2 * w, 2 * h) if scene.supersampling else (w, h)
    img = np.zeros((rh, rw, 3))
    for yy in range(rh):
        for xx in range(rw):
            img[yy, xx] = trace_pixel(cfg, stars, rw, rh, xx, yy)
    if scene.supersampling:
        img = supersample(img)
    return img


def box_blur(img, r, passes=3):
    """Naive zero-padded box blur, horizontal then vertical per pass."""
    out = img.astype(np.float64).copy()
    hgt, wid, _ = out.shape
    norm = 1.0 / (2 * r + 1)
    for _ in range(passes):
        tmp = out.copy()
        for yy in range(hgt):
            for xx in range(wid):
                lo, hi = max(0, xx - r), min(wid - 1, xx + r)
                out[yy, xx] = tmp[yy, lo : hi + 1].sum(axis=0) * norm
        tmp = out.copy()
        for xx in range(wid):
            for yy in range(hgt):
                lo, hi = max(0, yy - r), min(hgt - 1, yy + r)
                out[yy, xx] = tmp[lo : hi + 1, xx].sum(axis=0) * norm
    return out


def bloom(img, strength, divider):
    return img + strength * box_blur(img, img.shape[1] // divider, 3)


def supersample(img):
    h, w, c = img.shape
    return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def srgb(x):
    x = np.asarray(x, np.float64)
    return np.where(x < 0.0031308, 12.92 * x, 1.055 * np.maximum(x, 1e-12) ** (1 / 2.4) - 0.055)
