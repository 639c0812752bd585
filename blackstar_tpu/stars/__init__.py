from blackstar_tpu.stars.catalog import parse_ppm, SPECTRAL_COLORS, spectral_color
from blackstar_tpu.stars.grid import StarGrid, build_star_grid, load_star_grid, save_star_grid

__all__ = [
    "parse_ppm",
    "SPECTRAL_COLORS",
    "spectral_color",
    "StarGrid",
    "build_star_grid",
    "load_star_grid",
    "save_star_grid",
]
