"""Host-side capacity regrow: the TPU answer to dynamic topology.

The reference creates entities/links dynamically on demand
(`mundy/mesh/src/mundy_mesh/LinkData.hpp:159-183,446` — device-side
request_link pools resolved by `process_requests`). A TPU program has static
shapes, so every structure here is capacity-bounded with a sticky on-chip
overflow flag; this module closes the loop: when a block of steps trips the
flag, the host grows the violated capacities, rebuilds the search
structures, and RETRIES the block from the last good state (an overflowed
block may have silently dropped interactions, so its physics is discarded).

Each sim exposes `regrow(state) -> state`: bump its static capacities by
`GROW` and re-derive the per-state structures from the state's positions.
Growing is geometric, so any finite required capacity is reached in
O(log) retries; `max_regrows` bounds pathological configs.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax

GROW = 1.6  # geometric capacity growth per regrow


def _overflowed(state: Any) -> bool:
    ovf = state["overflow"] if isinstance(state, dict) else state.overflow
    return bool(jax.device_get(ovf))


def grow_int(v: int, align: int = 8) -> int:
    """v * GROW rounded up to `align` (always strictly larger)."""
    g = int(v * GROW) + 1
    return ((g + align - 1) // align) * align


def run_blocks(sim, state, num_steps: int, block: int,
               log: Callable[[str], None] = print,
               status: Optional[Callable[[Any, int, float], str]] = None,
               max_regrows: int = 8):
    """Shared app run loop: block stepping + overflow-triggered regrow.

    `status(state, done, tps) -> str` formats the per-block log line.
    Returns the final state. Raises only if regrowing `max_regrows` times
    still overflows.
    """
    regrows = 0
    # init-time overflow: regrow before any stepping
    while _overflowed(state):
        if regrows >= max_regrows:
            raise RuntimeError("capacity overflow persists after "
                               f"{regrows} regrows")
        log(f"capacity overflow at init: regrow #{regrows + 1}")
        state = sim.regrow(state)
        regrows += 1
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    done = 0
    while done < num_steps:
        n = min(block, num_steps - done)
        new_state = sim.run_block(state, n)
        jax.block_until_ready(new_state)
        if _overflowed(new_state):
            if regrows >= max_regrows:
                raise RuntimeError("capacity overflow persists after "
                                   f"{regrows} regrows")
            log(f"capacity overflow in block at step {done}: "
                f"regrow #{regrows + 1}, retrying block")
            state = sim.regrow(state)  # retry from the last GOOD state
            regrows += 1
            continue
        state = new_state
        done += n
        tps = done / max(time.perf_counter() - t0, 1e-9)
        log(status(state, done, tps) if status is not None
            else f"step {done}/{num_steps}  tps={tps:.2f}")
    return state
