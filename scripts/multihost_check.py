"""Two-process multi-host validation on CPU.

Launches 2 OS processes, each with 4 virtual CPU devices, joined through
``blackstar_tpu.parallel.initialize_distributed`` into one 8-device global
mesh, renders scenes/default.yaml (reduced) sharded across BOTH processes,
and checks the global image checksum against a single-process render.

This exercises the actual multi-host code path (jax.distributed +
cross-process collectives) that a TPU pod would use — the closest a
single-host environment gets to the ≥2-host scaling gate.

Usage: python scripts/multihost_check.py           # launcher
       (internally re-invokes itself with _worker <pid>)
"""

import os
import subprocess
import sys

PORT = 12355
N_PROC = 2
DEV_PER_PROC = 4


def worker(pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from blackstar_tpu.parallel import initialize_distributed, make_mesh, render_sharded
    from blackstar_tpu.render import render
    import jax.numpy as jnp
    import dataclasses

    initialize_distributed(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.device_count() == N_PROC * DEV_PER_PROC, jax.devices()
    assert jax.process_count() == N_PROC

    from blackstar_tpu.config import Config, load_config

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..", "scenes", "default.yaml"))
    cfg = Config(
        scene=dataclasses.replace(
            cfg.scene, resolution=(64, 36), max_steps=200, dtype="float32",
            bloom_strength=0.0,
        ),
        camera=cfg.camera,
    )
    params, static = cfg.params(), cfg.static()

    mesh = make_mesh()  # all 8 devices across both processes
    fn = jax.jit(lambda p: jnp.sum(render_sharded(p, static, mesh=mesh)))
    total = float(fn(params))

    # Single-process reference (local devices only, plain render).
    want = float(jax.jit(lambda p: jnp.sum(render(p, static)))(params))
    ok = abs(total - want) < 1e-3 * max(1.0, abs(want))
    print(f"[proc {pid}] global sum {total:.4f} vs single {want:.4f} -> "
          f"{'OK' if ok else 'MISMATCH'}")
    if not ok:
        sys.exit(1)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "_worker":
        worker(int(sys.argv[2]))
        return
    procs = [
        subprocess.Popen([sys.executable, __file__, "_worker", str(i)])
        for i in range(N_PROC)
    ]
    rc = [p.wait(timeout=600) for p in procs]
    if any(rc):
        sys.exit(1)
    print("multi-host check passed: 2 processes x 4 devices, sharded render == single")


if __name__ == "__main__":
    main()
