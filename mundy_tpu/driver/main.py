"""CLI driver: `python -m mundy_tpu.driver.main config.yaml [--set k=v ...]`.

The `main()` entry of the reference app drivers (CommandLineProcessor +
getParametersFromYamlFile, `HP1...neigh_linker.cpp:1021-1062`), with
checkpoint/continuation handled the way the reference's
`enable_continuation_if_available` does (`:897-899`).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax

from mundy_tpu.driver.configurator import available_apps, build_simulation_from_yaml
from mundy_tpu.io import latest_checkpoint, load_checkpoint, save_checkpoint


def _parse_overrides(pairs):
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got '{p}'")
        k, v = p.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=f"mundy_tpu driver. Apps: {', '.join(available_apps())}"
    )
    ap.add_argument("config", help="YAML config with 'app' and 'params'")
    ap.add_argument("--set", nargs="*", metavar="KEY=VALUE", dest="overrides",
                    help="parameter overrides (JSON-parsed values)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="directory for periodic checkpoints + continuation")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="steps between checkpoints (0 = only at end)")
    ap.add_argument("--continue", dest="resume", action="store_true",
                    help="resume from the latest checkpoint if present")
    ap.add_argument("--platform", default=None, help="jax platform override (cpu/axon)")
    args = ap.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # enable x64 before building the sim if the config requests float64
    # (otherwise jnp silently truncates and warns on every call)
    from mundy_tpu.core.config import load_yaml

    overrides = _parse_overrides(args.overrides)
    spec = load_yaml(args.config)
    dtype = (overrides.get("dtype") or (spec.get("params") or {}).get("dtype"))
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    config, sim = build_simulation_from_yaml(args.config, overrides)
    print(f"app config: {config}")

    state = sim.init()
    start_step = 0
    if args.resume and args.checkpoint_dir:
        ck = latest_checkpoint(args.checkpoint_dir)
        if ck is not None:
            state = load_checkpoint(ck, state)
            start_step = int(state.step)
            print(f"resumed from {ck} at step {start_step}")

    total = config.num_steps
    block = args.checkpoint_every or total
    done = start_step
    while done < total:
        n = min(block, total - done)
        sub = sim.run_block(state, n) if hasattr(sim, "run_block") else None
        state = sub
        jax.block_until_ready(state)
        done += n
        print(f"step {done}/{total}")
        if args.checkpoint_dir:
            save_checkpoint(args.checkpoint_dir, done, state)
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
