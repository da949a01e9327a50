"""ctypes bindings for the native runtime library (csrc/pylbl_native.cpp).

Built on demand with the repo Makefile; every entry point has a pure-Python
fallback so the framework works without a compiler.
"""
import ctypes
import subprocess
from pathlib import Path

import numpy as np

CSRC = Path(__file__).resolve().parents[2] / "csrc"
LIB_PATH = CSRC / "libpylbl_native.so"
# Installed layout: setup.py's build step drops the library next to the
# package (pylbl_tpu/libpylbl_native.so); the repo layout builds it in
# csrc/ on demand.
PKG_LIB_PATH = Path(__file__).resolve().parents[1] / "libpylbl_native.so"

_lib = None
_build_failed = False


def _dp(dtype=np.float64):
    return np.ctypeslib.ndpointer(dtype, flags="C_CONTIGUOUS")


def load(build=True):
    """Returns the loaded library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    source = CSRC / "pylbl_native.cpp"
    try:
        if build and source.exists() and (
                not LIB_PATH.exists()
                or source.stat().st_mtime > LIB_PATH.stat().st_mtime):
            subprocess.run(["make", "-C", str(CSRC)], check=True,
                           capture_output=True)
        path = LIB_PATH if LIB_PATH.exists() else PKG_LIB_PATH
        lib = ctypes.CDLL(str(path))
    except (OSError, subprocess.CalledProcessError):
        _build_failed = True
        return None

    i64 = _dp(np.int64)
    u8 = _dp(np.uint8)
    f64 = _dp(np.float64)
    lib.parse_transitions_csv.restype = ctypes.c_int64
    lib.parse_transitions_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        i64, i64, i64, f64, f64, f64, f64, f64, f64, f64,
        ctypes.c_int64]
    lib.pedestal_scan.restype = None
    lib.pedestal_scan.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64, u8, u8, u8, u8, u8,
        f64, f64, f64, f64, f64, f64]
    _lib = lib
    return _lib


def available():
    return load() is not None


def parse_transitions_csv(text):
    """Parses a HITRAN CSV results buffer into SoA arrays.

    Args:
        text: str or bytes CSV content (ingestion parameter order,
            reference database.py:89-90).

    Returns:
        dict of arrays {global_iso_id, molec_id, local_iso_id, nu, sw,
        gamma_air, gamma_self, n_air, delta_air, elower}, malformed rows
        skipped — or None if the native library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    if isinstance(text, str):
        text = text.encode("utf-8")
    max_rows = text.count(b"\n") + 2
    out = {
        "global_iso_id": np.empty(max_rows, np.int64),
        "molec_id": np.empty(max_rows, np.int64),
        "local_iso_id": np.empty(max_rows, np.int64),
        "nu": np.empty(max_rows, np.float64),
        "sw": np.empty(max_rows, np.float64),
        "gamma_air": np.empty(max_rows, np.float64),
        "gamma_self": np.empty(max_rows, np.float64),
        "n_air": np.empty(max_rows, np.float64),
        "delta_air": np.empty(max_rows, np.float64),
        "elower": np.empty(max_rows, np.float64),
    }
    rows = lib.parse_transitions_csv(
        text, len(text),
        out["global_iso_id"], out["molec_id"], out["local_iso_id"],
        out["nu"], out["sw"], out["gamma_air"], out["gamma_self"],
        out["n_air"], out["delta_air"], out["elower"], max_rows)
    return {key: value[:rows] for key, value in out.items()}


def pedestal_scan(bucket_rel, skip, left_clamp, right_clamp, cover0, coverN,
                  k_s_contrib, pre_contrib_e, cum0_incl, cumN_incl,
                  window, num_buckets):
    """Runs the sequential pedestal scan natively.

    Returns ped [N], or None if the native library is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    num = bucket_rel.size
    ped = np.zeros(num)
    scratch = np.zeros(int(num_buckets))
    lib.pedestal_scan(
        num, int(window), int(num_buckets),
        np.ascontiguousarray(bucket_rel, np.int64),
        np.ascontiguousarray(skip, np.uint8),
        np.ascontiguousarray(left_clamp, np.uint8),
        np.ascontiguousarray(right_clamp, np.uint8),
        np.ascontiguousarray(cover0, np.uint8),
        np.ascontiguousarray(coverN, np.uint8),
        np.ascontiguousarray(k_s_contrib, np.float64),
        np.ascontiguousarray(pre_contrib_e, np.float64),
        np.ascontiguousarray(cum0_incl, np.float64),
        np.ascontiguousarray(cumN_incl, np.float64),
        scratch, ped)
    return ped
