#!/usr/bin/env python
"""A/B parity of kernel formulations vs the C oracle (full workload).

Quantifies how much of the headline parity error comes from each
formulation choice (seg vs rows core, seg vs tile wings) and how much
from plain f32 accumulation at 300k overlapping lines.

Usage: python tools/parity_ab.py [num_lines]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from pylbl_tpu.database.fixtures import synthetic_line_pack  # noqa: E402
from pylbl_tpu.models.lines import internal_grid  # noqa: E402
from pylbl_tpu.models.lines.physics import (kernel_inputs,  # noqa: E402
                                            line_profile_params)
from pylbl_tpu.ops import lineshape  # noqa: E402
from pylbl_tpu.ops.lineshape_pallas import make_device_plan  # noqa: E402

TEMPERATURE = 288.99
PRESSURE = 98388.0
VMR = 6.637074e-03
CUT_OFF = 25


def main():
    num_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    pack = synthetic_line_pack(
        num_lines=num_lines, nu_min=0.5, nu_max=5100.0, seed=1,
        band_centers=(150.0, 1600.0, 3700.0, 500.0))
    grid = np.arange(1.0, 5000.0, 0.1)
    v0, vn, n_per_v, n = internal_grid(grid)
    keep = pack.compat_break_filter(v0, vn, CUT_OFF)
    params = line_profile_params(pack, TEMPERATURE, PRESSURE, VMR,
                                 keep=keep)
    kin = kernel_inputs(params, v0, n_per_v, CUT_OFF)
    arrays = lineshape.prepare_kernel_arrays(kin, n_per_v, np.float32)

    import oracle
    assert oracle.available()
    want = oracle.absorption(pack, TEMPERATURE, PRESSURE, VMR, v0, vn,
                             n_per_v, cut_off=CUT_OFF)
    scale = want.max()

    for core_mode, wings_mode in (("seg", None), ("seg", "tile"),
                                  ("seg", "seg"), ("rows", "tile")):
        t0 = time.perf_counter()
        plan = make_device_plan(arrays, kin, n, n_per_v, CUT_OFF,
                                core_mode=core_mode, wings_mode=wings_mode)
        got = np.asarray(plan(), np.float64)
        err = np.abs(got - want)
        print(f"core={core_mode:4s} wings={wings_mode:4s} "
              f"max_abs={err.max():.3e} max_rel={err.max() / scale:.3e} "
              f"({time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()
