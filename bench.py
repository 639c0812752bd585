"""Benchmark: full-pipeline render throughput on the reference's canonical
workload.

scenes/default.yaml — 1920×1080, stepSize 0.3, accretion disk on, bloom 0.15,
no supersampling (BASELINE.md "canonical workload"), with the committed
full-scale star catalogue (the reference *requires* a star map and every
escaped ray does a star lookup, app/Main.hs:46-50 + Raytracer.hs:94-95).
Metric: Mrays/s for the complete pipeline — ray generation + geodesic march
+ celestial-sphere star shading + bloom — steady-state, excluding
compilation. ``vs_baseline`` is measured / 50 Mrays/s/chip (the
BASELINE.json north-star target — the reference itself publishes no
numbers).

Fault tolerance: the axon TPU tunnel occasionally drops a backend mid-run
(round 1's bench of record died to a transient FAILED_PRECONDITION) and a
dead tunnel can also HANG (backend init blocks forever inside C++ —
observed Aug 2026; a SIGALRM watchdog cannot interrupt a hang that never
returns to the interpreter). Each attempt therefore runs in a fresh child
process under a hard timeout: a hang or crash becomes a retryable failure,
and a new process is the strongest possible backend reset.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "stars",
"march_only_mrays", "ms_per_frame"}. Before any attempt, a ~150 s child
liveness probe fails the whole bench in ~5 minutes when the tunnel is dead
instead of burning full attempt timeouts; if the full-pipeline stage dies
after the march stage finished, the march-only partial line (tagged
"partial": true) is emitted instead of nothing.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
ATTEMPTS = 3
FRAMES_PER_CALL = 8
NORTH_STAR = 50.0  # Mrays/s/chip (BASELINE.json)


def _load_star_grid(dtype):
    """The full-scale grid, built deterministically from the committed
    stars.ppm catalogue on first use (and cached as stars.grid.npz)."""
    from blackstar_tpu.stars.artifact import default_star_grid

    grid = default_star_grid(dtype=dtype)
    if grid is None:
        raise RuntimeError("stars.ppm missing — cannot build the star grid")
    return grid


def measure() -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from blackstar_tpu.config import load_config
    from blackstar_tpu.ops.filters import bloom
    from blackstar_tpu.render import render
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()

    cfg = load_config(os.path.join(HERE, "scenes", "default.yaml"))
    static = cfg.static()
    params = cfg.params()
    star_grid = _load_star_grid(static.jdtype)

    # Steady-state device throughput: render K frames back-to-back inside
    # ONE dispatch (each with an O(1e-7) mass perturbation so XLA cannot
    # hoist the loop-invariant render), reduced on device so timing forces
    # execution with a scalar fetch (on tunneled platforms block_until_ready
    # alone may not block). One K-frame dispatch runs a few hundred ms, so
    # the experimental axon tunnel's ~27 ms per-dispatch overhead stays a
    # small fraction of the measurement instead of capping it; on a
    # directly-attached TPU this agrees with per-frame dispatch timing.
    def k_frames(p, g, with_bloom):
        def body(i, acc):
            p2 = dataclasses.replace(p, mass=p.mass + 1e-7 * i)
            img = render(p2, static, g)
            if with_bloom:
                img = bloom(
                    img, p2.bloom_strength.astype(img.dtype), static.bloom_divider
                )
            return acc + jnp.sum(img)

        return jax.lax.fori_loop(0, FRAMES_PER_CALL, body, jnp.float32(0.0))

    import functools

    full = jax.jit(functools.partial(k_frames, with_bloom=True))
    march = jax.jit(functools.partial(k_frames, with_bloom=False))

    def timed(fn, *args):
        float(fn(*args))  # warm-up / compile
        # Keep a couple of dispatches in flight before fetching, so per-call
        # host round-trip overhead is amortised out of the steady state.
        reps = 2
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(reps)]
            for o in outs:
                float(o)
            times.append((time.perf_counter() - t0) / (reps * FRAMES_PER_CALL))
        return min(times)

    n_rays = static.render_width * static.render_height

    # March first (small compile, no star grid): if the tunnel dies during
    # the much heavier full-pipeline stage, the march number has already
    # been emitted as a partial line the parent can fall back on.
    t_march = timed(march, params, None)
    march_mrays = round(n_rays / t_march / 1e6, 3)
    print(
        json.dumps(
            {
                "metric": "march_only_throughput_default_1080p",
                "value": march_mrays,
                "unit": "Mrays/s",
                # Ratio against the BASELINE.json *forward* target; NOT the
                # full-pipeline headline — see the metric string and note.
                "vs_baseline": round(march_mrays / NORTH_STAR, 4),
                "partial": True,
                "note": "march-only (empty sky, no bloom); the full-pipeline "
                        "measurement did not complete",
            }
        ),
        flush=True,
    )

    t_full = timed(full, params, star_grid)
    mrays = n_rays / t_full / 1e6
    return {
        "metric": "full_pipeline_throughput_default_1080p",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR, 4),
        "stars": star_grid.n_stars,
        "march_only_mrays": march_mrays,
        "ms_per_frame": round(t_full * 1e3, 3),
    }


# Cold path covers the star-grid build + first compile; warm path (grid
# artifact + .jax_cache already on disk, the normal state of this box)
# finishes in well under 10 minutes, so a hang is detected much sooner.
# The cold budget must cover the full-pipeline compile through the
# tunnel's remote-compile path (~10 min observed r5) PLUS the measured
# march/full stages.
ATTEMPT_TIMEOUT_COLD_S = 1800
ATTEMPT_TIMEOUT_WARM_S = 600
# Healthy-tunnel backend init alone measured 73 s on this box (r3) — 90 s
# left only 17 s of headroom before a live tunnel read as dead.
PROBE_TIMEOUT_S = 150
# The tunnel FLAPS: r4's bench-of-record found it dead (probe failed twice
# in ~5 min, rc=1, no number recorded all round) and it was observed down
# for stretches of r5 too. Probing over a longer window with pauses turns
# "down for a few minutes at the wrong moment" into a recorded result; a
# genuinely dead tunnel still fails, just after ~20 min instead of ~5.
PROBES = 6
PROBE_PAUSE_S = 90


def _attempt_timeout() -> int:
    """Warm only when the grid artifact exists AND the newest compilation-
    cache entry postdates the newest source file — a stale cache after a
    code change means a full recompile, which must get the cold budget."""
    grid_warm = os.path.exists(os.path.join(HERE, "stars.grid.npz"))
    cache = os.path.join(HERE, ".jax_cache")
    try:
        cache_mtime = max(
            e.stat().st_mtime for e in os.scandir(cache) if e.is_file()
        )
    except (OSError, ValueError):
        return ATTEMPT_TIMEOUT_COLD_S
    src_mtime = os.path.getmtime(os.path.abspath(__file__))
    pkg = os.path.join(HERE, "blackstar_tpu")
    for root, _, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                src_mtime = max(src_mtime, os.path.getmtime(os.path.join(root, f)))
    warm = grid_warm and cache_mtime >= src_mtime
    return ATTEMPT_TIMEOUT_WARM_S if warm else ATTEMPT_TIMEOUT_COLD_S


_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "print(float(jnp.ones((8, 128)).sum()), jax.devices()[0].platform)"
)


def _backend_alive() -> bool:
    """Cheap liveness probe: a tiny op in a child process under a short
    timeout. A dead axon tunnel hangs inside backend init (not interruptible
    in-process), so the probe must be a separate process. ~1 s when the
    backend is healthy (CPU or TPU), PROBE_TIMEOUT_S when it is hung."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=PROBE_TIMEOUT_S,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _best_json_line(raw: bytes | None) -> str | None:
    """Last parseable JSON line of a child's stdout (final result if it got
    there, otherwise the most recent partial)."""
    if not raw:
        return None
    for line in reversed(raw.decode(errors="replace").strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            json.loads(line)
        except ValueError:
            continue
        return line
    return None


def main() -> None:
    if os.environ.get("_BENCH_CHILD") == "1":
        try:
            print(json.dumps(measure()), flush=True)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            raise SystemExit(1)
        return

    import subprocess

    # Probe before burning full attempt timeouts on a hung backend. The
    # window is deliberately patient (see PROBES above): the tunnel flaps,
    # and this is the measurement of record.
    for probe in range(PROBES):
        if _backend_alive():
            break
        print(
            f"bench liveness probe {probe + 1}/{PROBES} failed "
            f"(no tiny-op completion in {PROBE_TIMEOUT_S}s)",
            file=sys.stderr,
        )
        if probe + 1 < PROBES:
            time.sleep(PROBE_PAUSE_S)
    else:
        raise SystemExit(
            f"bench aborted before any attempt: backend liveness probe "
            f"failed {PROBES}x over ~{(PROBES * (PROBE_TIMEOUT_S + PROBE_PAUSE_S)) // 60}"
            " min — the TPU tunnel is down (a trivial op hangs)."
        )

    attempt_timeout = _attempt_timeout()
    last_err = None
    partial: str | None = None
    timeouts = 0
    for attempt in range(ATTEMPTS):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, "_BENCH_CHILD": "1"},
                stdout=subprocess.PIPE,
                timeout=attempt_timeout,
            )
            line = _best_json_line(proc.stdout)
            if proc.returncode == 0 and line is not None:
                print(line)
                return
            partial = line or partial
            last_err = f"child exited rc={proc.returncode}"
        except subprocess.TimeoutExpired as e:
            timeouts += 1
            partial = _best_json_line(e.stdout) or partial
            last_err = f"child exceeded {attempt_timeout}s (hung TPU tunnel?)"
            # A timeout means the warm-budget guess was WRONG (cold compile
            # in progress, or a slow tunnel): killing a compile at 600 s and
            # restarting it from scratch each attempt is a livelock — seen
            # live in r5, where the march stage finished but the cold
            # full-pipeline compile outlived every warm window. Escalate.
            attempt_timeout = max(attempt_timeout, ATTEMPT_TIMEOUT_COLD_S)
            if timeouts >= 3:
                break
        except Exception as e:  # noqa: BLE001 — retry any fault
            last_err = repr(e)
        print(
            f"bench attempt {attempt + 1}/{ATTEMPTS} failed ({last_err}); "
            "retrying in a fresh process",
            file=sys.stderr,
        )
        time.sleep(5.0 * (attempt + 1))
    if partial is not None:
        # Persist whatever stage finished (e.g. the march-only line) rather
        # than dying with nothing after a mid-run tunnel death.
        print(
            f"bench emitting PARTIAL result after failure ({last_err})",
            file=sys.stderr,
        )
        print(partial)
        return
    raise SystemExit(f"bench failed after {ATTEMPTS} attempts: {last_err}")


if __name__ == "__main__":
    main()
