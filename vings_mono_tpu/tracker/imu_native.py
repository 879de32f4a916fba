"""ctypes binding for the C++ preintegration core (csrc/preintegrate.cpp).

Built with g++ on first use into build/; the Python Preintegration keeps a
numpy fallback so environments without a toolchain still work. One C call
integrates a whole inter-keyframe measurement batch."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

STATE_DOUBLES = 286


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    root = _repo_root()
    src = os.path.join(root, "csrc", "preintegrate.cpp")
    out_dir = os.path.join(root, "build")
    so = os.path.join(out_dir, "libpreintegrate.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(out_dir, exist_ok=True)
            subprocess.run(["g++", "-O3", "-shared", "-fPIC",
                            "-o", so, src], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(so)
        d = ctypes.POINTER(ctypes.c_double)
        lib.preintegrate.argtypes = [d, d, ctypes.c_long, d, d,
                                     ctypes.c_double]
        lib.preintegrate.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def pack_state(pre):
    """Preintegration -> flat (286,) float64 state vector."""
    s = np.zeros(STATE_DOUBLES, np.float64)
    s[0:9] = pre.dR.reshape(-1)
    s[9:12] = pre.dv
    s[12:15] = pre.dp
    s[15] = pre.dt
    s[16:25] = pre.J_Rbg.reshape(-1)
    s[25:34] = pre.J_vbg.reshape(-1)
    s[34:43] = pre.J_vba.reshape(-1)
    s[43:52] = pre.J_pbg.reshape(-1)
    s[52:61] = pre.J_pba.reshape(-1)
    s[61:286] = pre.cov.reshape(-1)
    return s


def unpack_state(pre, s):
    pre.dR = s[0:9].reshape(3, 3).copy()
    pre.dv = s[9:12].copy()
    pre.dp = s[12:15].copy()
    pre.dt = float(s[15])
    pre.J_Rbg = s[16:25].reshape(3, 3).copy()
    pre.J_vbg = s[25:34].reshape(3, 3).copy()
    pre.J_vba = s[34:43].reshape(3, 3).copy()
    pre.J_pbg = s[43:52].reshape(3, 3).copy()
    pre.J_pba = s[52:61].reshape(3, 3).copy()
    pre.cov = s[61:286].reshape(15, 15).copy()


def integrate_batch(pre, meas_rows):
    """meas_rows: (M, 7) float64 [dt, acc(3), gyro(3)] raw (bias-inclusive).
    Mutates `pre` in place; returns True if the native path ran."""
    lib = get_lib()
    if lib is None or len(meas_rows) == 0:
        return False
    state = pack_state(pre)
    meas = np.ascontiguousarray(meas_rows, np.float64)
    bias = np.concatenate([pre.bg, pre.ba]).astype(np.float64)
    p = pre.params
    noise = np.asarray([p.gyr_n, p.acc_n, p.gyr_w, p.acc_w], np.float64)
    d = ctypes.POINTER(ctypes.c_double)
    lib.preintegrate(state.ctypes.data_as(d), meas.ctypes.data_as(d),
                     ctypes.c_long(len(meas)), bias.ctypes.data_as(d),
                     noise.ctypes.data_as(d),
                     ctypes.c_double(p.integration_n))
    unpack_state(pre, state)
    for row in meas_rows:
        pre.meas.append((np.asarray(row[1:4]), np.asarray(row[4:7]),
                         float(row[0])))
    return True
