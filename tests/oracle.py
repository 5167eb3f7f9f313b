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


def load_akb_engine(variant: str = "wolter_3_1"):
    """Import AKB_raytrace_20250312 with the requested engine variant.

    The reference selects among its three AKB engines with module-level
    booleans evaluated at import (:80-82), so for the non-default variants
    we execute the module source with those two assignments flipped — no
    code is modified on disk, the mounted reference stays the ground truth.
    """
    key = f"akb:{variant}"
    if key in _cache:
        return _cache[key]
    _stub_modules()
    os.environ.setdefault("MPLBACKEND", "Agg")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    cwd = os.getcwd()
    tmp = tempfile.mkdtemp(prefix="akb_oracle_")
    try:
        os.chdir(tmp)
        if variant == "wolter_3_1":
            import AKB_raytrace_20250312 as mod
        else:
            flags = {
                "wolter_3_3_tandem": ("option_wolter_3_1 = False",
                                      "option_wolter_3_3_tandem = True"),
                "wolter_3_3_alternating": ("option_wolter_3_1 = False",
                                           "option_wolter_3_3_tandem = False"),
            }[variant]
            src_path = os.path.join(_REF, "AKB_raytrace_20250312.py")
            with open(src_path, encoding="utf-8") as f:
                src = f.read()
            src = src.replace("option_wolter_3_1 = True", flags[0])
            src = src.replace("option_wolter_3_3_tandem = False", flags[1])
            import importlib.util

            name = f"AKB_oracle_{variant}"
            spec = importlib.util.spec_from_loader(name, loader=None,
                                                   origin=src_path)
            mod = importlib.util.module_from_spec(spec)
            mod.__file__ = src_path
            sys.modules[name] = mod
            exec(compile(src, src_path, "exec"), mod.__dict__)
    finally:
        os.chdir(cwd)
    _cache[key] = mod
    return mod


def load_iii_i_engine():
    """Import the mpmath-native III_I engine as a 20-digit oracle.

    ``AKB_raytrace_III_I_20250710.py`` is the reference's cleaned
    Wolter III (V) + Wolter I (H) engine, traced end-to-end in mpmath at
    ``mp.dps = 20`` (:15-16) with the Setting12/Setting11 constants
    (:952-1000) — the same design data as our ``WOLTER_3_1_DEFAULT``.
    Its ``plot_result_debug(params, 'wave')`` runs the full placement +
    exit-pupil-uniform re-fan + tilt rotation and returns every surface
    grid, detector intersections and unit segment vectors as mpmath
    matrices (:1830-1832) — the highest-precision trace oracle the
    reference provides.

    The fan size is the module globals ``wave_num_H/V`` (default 129);
    override them on the returned module before calling.
    """
    key = "iii_i"
    if key in _cache:
        return _cache[key]
    _stub_modules()
    os.environ.setdefault("MPLBACKEND", "Agg")
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    cwd = os.getcwd()
    tmp = tempfile.mkdtemp(prefix="akb_oracle_iii_i_")
    try:
        os.chdir(tmp)
        import AKB_raytrace_III_I_20250710 as mod
    finally:
        os.chdir(cwd)
    _cache[key] = mod
    return mod


class _CaptureDone(Exception):
    pass


def run_iii_i_ray_wave(params, n: int):
    """Run the III_I engine's 'ray_wave' path at an n x n fan and capture
    (detcenter, detcenter2, DistError, DistError2).

    The engine converts exactly these four arrays to numpy
    (``mpmath_matrix_to_numpy`` call sites, AKB_raytrace_III_I_20250710.py:
    1916-1919) right after the OPL sums — we wrap that function with a
    recorder and abort once all four are captured, skipping the plotting /
    griddata / Legendre tail (which needs scipy/cv2 state the stub image
    lacks and contributes nothing to parity).  DistError is the engine's
    wavefront signal ``(totalDist - mean(totalDist))*1e9`` [nm] (:1887).

    mpmath matrices gain a ``shape`` property (the engine's own 'wave'
    branch reads ``.shape`` on one, :1785 — a latent reference bug that
    only 'wave' hits; harmless to patch process-wide).
    """
    import numpy as np
    from mpmath import matrix, mpf

    if not hasattr(matrix, "shape"):
        matrix.shape = property(lambda self: (self.rows, self.cols))
    mod = load_iii_i_engine()
    mod.wave_num_H = mod.wave_num_V = n
    real_conv = mod.mpmath_matrix_to_numpy
    captured = []

    def recorder(mat):
        out = real_conv(mat)
        captured.append(np.asarray(out, dtype=np.float64))
        if len(captured) == 4:
            raise _CaptureDone
        return out

    mod.mpmath_matrix_to_numpy = recorder
    try:
        with in_scratch_dir():
            try:
                mod.plot_result_debug([mpf(str(p)) for p in params],
                                      "ray_wave")
            except _CaptureDone:
                pass
    finally:
        mod.mpmath_matrix_to_numpy = real_conv
    assert len(captured) == 4, f"captured {len(captured)} arrays"
    det, det2, dist_err, dist_err2 = captured
    return det, det2, dist_err.ravel(), dist_err2.ravel()


@contextlib.contextmanager
def in_scratch_dir():
    cwd = os.getcwd()
    tmp = tempfile.mkdtemp(prefix="akb_oracle_run_")
    try:
        os.chdir(tmp)
        yield tmp
    finally:
        os.chdir(cwd)


def run_wavecalc_cpu(handoff_dir: str) -> str:
    """Execute the reference Huygens pipeline on a wave-handoff directory.

    Runs the *actual* ``Wavecalc_raytrace_fromData_CPU0402.py`` __main__
    (:190-377) — its conditions parser (incl. the pix_H/V swap logic
    :218-231), its stage chain source->M1->M2(->M3->M4)->Image->Image2,
    its x2 image-grid resize (:330-334) — with numba stubbed to plain
    numpy.  The script hardcodes ``folder_path = 'output_20250404_
    sNAAKB701'`` (:192); we satisfy it with a symlink in a scratch cwd
    instead of editing the source.  Returns the absolute path of the
    output directory the reference created (complex_data_*.npz +
    resized points_gridImage*.npy inside).
    """
    _stub_modules()
    src_path = os.path.join(_REF, "Wavecalc_raytrace_fromData_CPU0402.py")
    with open(src_path, encoding="utf-8") as f:
        src = f.read()
    with in_scratch_dir() as tmp:
        os.symlink(os.path.abspath(handoff_dir),
                   os.path.join(tmp, "output_20250404_sNAAKB701"))
        name = "Wavecalc_oracle_cpu"
        mod = types.ModuleType(name)
        mod.__file__ = src_path
        mod.__name__ = "__main__"  # run the pipeline, not just the defs
        sys.modules[name] = mod
        try:
            exec(compile(src, src_path, "exec"), mod.__dict__)
        finally:
            sys.modules.pop(name, None)
        out_dirs = [d for d in os.listdir(tmp)
                    if d.startswith("output_") and not os.path.islink(
                        os.path.join(tmp, d))]
        assert len(out_dirs) == 1, out_dirs
        return os.path.join(tmp, out_dirs[0])
