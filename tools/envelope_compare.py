#!/usr/bin/env python
"""A/B of the batched pipeline under the wide default kernel envelope
(350 K, 5 atm) vs the atmosphere-derived tight envelope.

Quantifies the "known headroom" item from docs/performance.md: the tight
envelope shrinks the layer-independent rows-core instance windows, cutting
the rows pass's instance count (~29% on the canonical column) and its
share of wall time.

Usage: python tools/envelope_compare.py [num_lines] [num_layers] [reps]
Prints one JSON line.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from pylbl_tpu.database.fixtures import synthetic_line_pack  # noqa: E402
from pylbl_tpu.models.lines import internal_grid  # noqa: E402
from pylbl_tpu.parallel.lines import (derive_envelope,  # noqa: E402
                                      make_batched_tpu_fn)


def chained_rate(inner, t, p, x, reps=5):
    import jax.numpy as jnp

    @jax.jit
    def chained(t, p, x, nreps):
        def body(i, carry):
            acc, tt = carry
            out = inner(tt, p, x)
            # Reduce over the FULL output (sum, not one element): a
            # single-element readback lets XLA dead-code-eliminate the
            # rest of the kernel (CLAUDE.md microbench pitfall).
            acc = acc + jnp.sum(out) * jnp.float32(1e-30)
            return (acc, tt + acc * 0)
        acc, _ = jax.lax.fori_loop(0, nreps, body, (jnp.float32(0), t))
        return acc

    float(chained(t, p, x, 1))
    t0 = time.perf_counter()
    float(chained(t, p, x, 1))
    one = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(t, p, x, reps + 1))
    many = time.perf_counter() - t0
    return max((many - one) / reps, 1e-9)


def main():
    num_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    num_layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    pack = synthetic_line_pack(
        num_lines=num_lines, nu_min=0.5, nu_max=5100.0, seed=1,
        band_centers=(150.0, 1600.0, 3700.0, 500.0))
    grid = np.arange(1.0, 5000.0, 0.1)
    t = np.linspace(203.37, 288.99, num_layers).astype(np.float32)
    p = np.geomspace(117.0, 98388.0, num_layers).astype(np.float32)
    x = np.full(num_layers, 6.637074e-03, np.float32)
    t_max, p_max_atm = derive_envelope(t, p)

    report = {"num_lines": num_lines, "num_layers": num_layers,
              "derived_envelope": [t_max, p_max_atm]}
    # Result parity between the two envelopes is pinned by
    # tests/test_parallel.py::test_batched_fn_tight_envelope_matches_default
    # (interpret mode); here only wall time is measured, one compile per
    # variant (remote compiles through the tunnel are minutes each).
    for name, kwargs in (("default_350K_5atm", {}),
                         ("derived", {"t_max": t_max,
                                      "p_max_atm": p_max_atm})):
        fn = make_batched_tpu_fn(pack, grid, **kwargs)
        per_call = chained_rate(fn.inner, t, p, x, reps)
        report[name] = {"wall_s_per_call": round(per_call, 5)}
    report["speedup"] = round(
        report["default_350K_5atm"]["wall_s_per_call"]
        / report["derived"]["wall_s_per_call"], 4)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
