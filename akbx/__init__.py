"""akbx — TPU-native differentiable X-ray mirror raytracing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
AKBRaytracing reference scripts (quadric grazing-incidence optics: KB and
AKB/Wolter systems; design, ray trace, wavefront/PSF analysis, Huygens-Fresnel
wave propagation, alignment optimization, fabrication export).

Everything in the compute path is pure JAX: rays are batched arrays, mirrors
are small pytrees, the trace is a chain of pure functions, and the whole
pipeline is differentiable end-to-end (the reference's derivative-free
alignment searches become gradient descent here).

float64 is required: optical path lengths are ~1e2 m with ~1e-10 m signals
(relative 1e-12).  We enable x64 at import; the Pallas kernels use
double-float (two-f32) arithmetic where native f64 would be too slow.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from akbx import config  # noqa: E402,F401
from akbx.core import geometry  # noqa: E402,F401
