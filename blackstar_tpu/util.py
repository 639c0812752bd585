"""Small CLI utilities (reference ``/root/reference/src/Util.hs``)."""

from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager
from typing import Callable


def prompt_overwrite_file(path: str, do_write: Callable[[str], None], force: bool = False) -> bool:
    """Write via ``do_write`` unless the file exists and the user declines
    (Util.hs:18-27). Returns True if written."""
    if force or not os.path.exists(path):
        do_write(path)
        return True
    if not sys.stdin.isatty():
        # Non-interactive run (nohup/CI): take the prompt's safe default
        # instead of crashing a long batch with EOFError mid-run.
        print(f"{path} exists and stdin is not a terminal — not overwriting "
              "(pass --force to overwrite).")
        return False
    answer = input(f"Overwrite {path}? [y/N] ")
    if answer in ("y", "Y"):
        do_write(path)
        return True
    print("Nothing was written.")
    return False


def normalize_path(path: str) -> str:
    """Normalise relative to the current directory (Util.hs:29-31)."""
    return os.path.normpath(os.path.relpath(path)) if path else path


@contextmanager
def time_action(name: str):
    """Wall-clock a block, printing "<name> completed in X min Y sec."
    (Util.hs:33-41)."""
    t0 = time.perf_counter()
    yield
    secs = int(round(time.perf_counter() - t0))
    print(f"{name} completed in {secs // 60} min {secs % 60} sec.")


def clear_screen() -> None:
    """ANSI clear + home (app/Main.hs:73-74)."""
    if sys.stdout.isatty():
        sys.stdout.write("\x1b[2J\x1b[H")
        sys.stdout.flush()


def enable_compilation_cache() -> None:
    """Point JAX at the repo-local persistent compilation cache.

    The march kernels take tens of seconds to (re)compile per process; the
    CLIs, bench.py, and the driver entries all call this so cold starts
    reuse prior compiles (tests/conftest.py does the same for the suite).
    Safe to call multiple times; a no-op if the user already configured one.
    """
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    try:
        if jax.config.jax_compilation_cache_dir:
            return  # the user already configured one
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the knobs: cold compiles, not a failure
