"""arkplonk_tpu — TPU-native PLONK proving stack (JAX/XLA/Pallas).

Package import enables the persistent XLA compile cache for device runs
(see perf.py for why); set ARKPLONK_CACHE=0 to opt out.
"""

from . import perf as _perf

_perf.maybe_enable_compile_cache()
