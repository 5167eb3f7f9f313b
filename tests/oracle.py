"""Import the reference engine as a numerical oracle.

The reference (``/root/reference/AKB_raytrace_20250312.py``) imports numba
and tifffile, which are absent in this image but unused on the trace path
(numba is never referenced after import; tifffile only in ``option_save``
plot branches).  We stub them, run the import in a scratch cwd (the module
creates an output directory at import), and expose ``plot_result_debug`` /
``KB_debug`` for golden-value parity tests.
"""

from __future__ import annotations

import contextlib
import os
import sys
import tempfile
import types

_REF = "/root/reference"
_cache = {}


def _stub_modules():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]):
                return args[0]
            return lambda f: f

        numba.njit = njit
        numba.prange = range
        sys.modules["numba"] = numba
    if "tifffile" not in sys.modules:
        tif = types.ModuleType("tifffile")
        tif.imwrite = lambda *a, **k: None
        sys.modules["tifffile"] = tif


def load_akb_engine():
    """Import AKB_raytrace_20250312 (wolter_3_1 variant active) once."""
    if "akb" in _cache:
        return _cache["akb"]
    _stub_modules()
    os.environ.setdefault("MPLBACKEND", "Agg")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    cwd = os.getcwd()
    tmp = tempfile.mkdtemp(prefix="akb_oracle_")
    try:
        os.chdir(tmp)
        import AKB_raytrace_20250312 as mod
    finally:
        os.chdir(cwd)
    _cache["akb"] = mod
    return mod


@contextlib.contextmanager
def in_scratch_dir():
    cwd = os.getcwd()
    tmp = tempfile.mkdtemp(prefix="akb_oracle_run_")
    try:
        os.chdir(tmp)
        yield tmp
    finally:
        os.chdir(cwd)
