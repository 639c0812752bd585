"""Unified CLI dispatcher: ``python -m blackstar_tpu <command> ...``.

Subcommands mirror the reference's three executables (blackstar.cabal:44-79):
``render`` (app/Main.hs), ``animate`` (app/Animate.hs), and ``generate-grid``
(app/GenerateTree.hs — the k-d tree is replaced by the bucketed star grid).
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    commands = {
        "render": "blackstar_tpu.cli.render",
        "animate": "blackstar_tpu.cli.animate",
        "generate-grid": "blackstar_tpu.cli.generate_grid",
        "fit": "blackstar_tpu.cli.fit",
    }
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in commands:
        prog = "python -m blackstar_tpu"
        print(f"usage: {prog} {{render,animate,generate-grid,fit}} ...")
        print()
        print("  render         render scene YAML(s) to PNG")
        print("  animate        expand a keyframe animation into frame YAMLs")
        print("  generate-grid  build the star grid from a PPM catalogue")
        print("  fit            fit scene parameters to a target image")
        return 0 if argv and argv[0] in ("-h", "--help") else 2

    import importlib

    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    mod = importlib.import_module(commands[argv[0]])
    return mod.main(argv[1:])


if __name__ == "__main__":
    sys.exit(main())
