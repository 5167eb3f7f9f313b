"""Typed configuration replacing the reference's module-level ``option_*`` globals.

The reference drives every behavior switch through mutated globals
(``AKB_raytrace_20250312.py:48-114``: ``option_AKB``, ``option_wolter_3_1``,
``option_energy``, ``option_HighNA``, ``unit``/``wave_num_*``, ...).  Here the
same knobs are immutable dataclasses passed explicitly, so traced functions
stay pure and jit-cacheable.
"""

from __future__ import annotations

import dataclasses
import enum


class Energy(str, enum.Enum):
    """Beam energy regime -> wavelength (reference: AKB_raytrace_20250312.py:1161-1166)."""

    EUV = "EUV"
    SOFT_XRAY = "softXray"
    HARD_XRAY = "hardXray"

    @property
    def wavelength_m(self) -> float:
        return {
            Energy.EUV: 13.5e-9,
            Energy.SOFT_XRAY: 1.35e-9,
            Energy.HARD_XRAY: 1.35e-10,
        }[self]

    @property
    def wavelength_nm(self) -> float:
        return self.wavelength_m * 1e9


class WolterOrdering(str, enum.Enum):
    """Mirror ordering of the 4-mirror AKB system.

    The reference selects among three engine variants via globals
    (``option_wolter_3_1`` / ``option_wolter_3_3_tandem`` / alternating,
    AKB_raytrace_20250312.py:80-82).  Here the ordering is data: the trace
    engine consumes a mirror sequence, so one engine serves all three.
    """

    WOLTER_3_1 = "wolter_3_1"  # hyp_V -> ell_V -> ell_H -> hyp_H
    WOLTER_3_3_TANDEM = "wolter_3_3_tandem"  # hyp_V -> ell_V -> hyp_H -> ell_H
    WOLTER_3_3_ALTERNATING = "wolter_3_3_alternating"  # hyp_V -> hyp_H -> ell_V -> ell_H


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static options of a trace run (shapes must be static under jit).

    This is the argument surface of :func:`akbx.trace.run` plus the system
    choice — ``trace.run_config(system, cfg, ...)`` consumes it directly,
    and ``akbx.cli trace --config file.json`` drives a whole run from it.
    """

    n_rays_h: int = 53
    n_rays_v: int = 53
    energy: Energy = Energy.EUV
    # Distance of the secondary ("wave"/defocused) detector plane from focus.
    # Reference: defocusForWave / defocusWave (1e-3 or 1e-2 m).
    defocus_for_wave: float = 1e-3
    high_na: bool = True
    # Re-trace with exit-pupil-uniform ray fan (reference :2849-2905).
    exit_pupil_uniform: bool = True
    # Remove the mean exit-beam tilt before the detector (reference :3564-3601).
    tilt_correction: bool = True
    # Beam-axis estimator for the tilt removal: "mean" (main engine) or
    # "extremes" (III_I engine; AKB_raytrace_III_I_20250710.py:1837-1840).
    tilt_mode: str = "mean"
    # Source-fan sampling: "uniform" linspace or "edge_dense" sigmoid ramp
    # (reference create_non_uniform_distribution, :375-382).
    fan_mode: str = "uniform"
    # Trace arithmetic: "f64" or "df32" (double-f32 deviation trace).
    precision: str = "f64"

    @property
    def n_rays(self) -> int:
        return self.n_rays_h * self.n_rays_v


@dataclasses.dataclass(frozen=True)
class WaveConfig:
    """Static options of a Huygens-Fresnel propagation run."""

    wavelength_m: float = 13.5e-9
    # Tile sizes of the Pallas O(N*M) kernel; multiples of 128.
    target_tile: int = 256
    source_tile: int = 512
    use_pallas: bool = True


def _asdict(cfg) -> dict:
    d = dataclasses.asdict(cfg)
    return {k: (v.value if isinstance(v, enum.Enum) else v)
            for k, v in d.items()}


def save_config(cfg, path: str) -> None:
    """Serialize a TraceConfig/WaveConfig to JSON (the typed replacement
    for the reference's calculation_conditions.txt / option_* globals)."""
    import json

    with open(path, "w") as fh:
        json.dump({"kind": type(cfg).__name__, **_asdict(cfg)}, fh, indent=1)


def load_config(path: str):
    """Load a config written by :func:`save_config` (kind-dispatched)."""
    import json

    with open(path) as fh:
        d = json.load(fh)
    kind = d.pop("kind", "TraceConfig")
    cls = {"TraceConfig": TraceConfig, "WaveConfig": WaveConfig}[kind]
    if cls is TraceConfig and "energy" in d:
        d["energy"] = Energy(d["energy"])
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(f"unknown {kind} keys: {sorted(unknown)}")
    return cls(**d)
