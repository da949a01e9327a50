"""Builds and wraps the reference-C parity oracle (test harness only)."""
import ctypes
import subprocess
from pathlib import Path

import numpy as np

REFERENCE_C = Path("/root/reference/pyLBL/c_lib")
HERE = Path(__file__).parent
LIB = HERE / "build" / "liboracle.so"

_cached = None


def available():
    return REFERENCE_C.exists()


def _build():
    LIB.parent.mkdir(exist_ok=True)
    sources = [str(HERE / "oracle_driver.c"),
               str(REFERENCE_C / "spectra.c"),
               str(REFERENCE_C / "voigt.c")]
    cmd = ["gcc", "-O2", "-shared", "-fPIC",
           f"-I{HERE / 'sqlite3_stub'}", f"-I{REFERENCE_C}",
           *sources, "-lm", "-o", str(LIB)]
    subprocess.run(cmd, check=True)


def load():
    """Returns the ctypes-wrapped oracle library, building it on demand."""
    global _cached
    if _cached is not None:
        return _cached
    if not LIB.exists() or any(
            p.stat().st_mtime > LIB.stat().st_mtime
            for p in [HERE / "oracle_driver.c"]):
        _build()
    lib = ctypes.CDLL(str(LIB))
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.oracle_absorption.restype = ctypes.c_int
    lib.oracle_absorption.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        dp, dp, dp, dp, dp, dp, dp, ip,
        dp,
        ctypes.c_int, ctypes.c_int,
        dp, dp,
        dp, ctypes.c_int, ctypes.c_int,
    ]
    lib.oracle_voigt.restype = None
    lib.oracle_voigt.argtypes = [
        dp, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, dp]
    _cached = lib
    return _cached


def absorption(pack, temperature, pressure, vmr, v0, vn, n_per_v,
               cut_off=25, remove_pedestal=False):
    """Reference spectrum for a LinePack via the compiled reference C code."""
    lib = load()
    n = (vn - v0) * n_per_v
    k = np.zeros(n)
    num_iso, num_t = pack.q_table.shape
    tips_t = np.ascontiguousarray(
        np.broadcast_to(pack.q_temperature, (num_iso, num_t)).ravel())
    tips_q = np.ascontiguousarray(pack.q_table.ravel())
    iso = np.ascontiguousarray(pack.iso, dtype=np.int32)
    lib.oracle_absorption(
        float(pressure), float(temperature), float(vmr),
        int(v0), int(vn), int(n_per_v),
        int(pack.num_lines),
        pack.nu, pack.sw, pack.gamma_air, pack.gamma_self,
        pack.n_air, pack.elower, pack.delta_air, iso,
        pack.mass_slots,
        int(num_t), int(num_iso), tips_t, tips_q,
        k, int(cut_off), int(remove_pedestal))
    return k


def voigt(wavenumbers, start, end, nu, alpha, gamma, sw):
    lib = load()
    w = np.ascontiguousarray(wavenumbers, dtype=np.float64)
    k = np.zeros(w.size)
    lib.oracle_voigt(w, int(start), int(end), float(nu), float(alpha),
                     float(gamma), float(sw), k)
    return k
