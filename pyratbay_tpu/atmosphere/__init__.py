"""Atmospheric structure models (pressure, temperature, composition, radius).

All model evaluations are pure JAX functions of their parameters, suitable
for jit/vmap/grad; static configuration (pressure grids, species sets) is
closed over at setup time.
"""
from .profiles import (
    pressure,
    isothermal_tp,
    guillot_tp,
    madhu_tp,
    get_tmodel,
)
from .vmr import (
    uniform_vmr,
    iso_vmr,
    scale_vmr,
    slant_vmr,
    bulk_ratio,
    balance_bulk,
    vmr_scale,
    qcapcheck,
)
from .hydro import (
    hydro_g,
    hydro_m,
    hill_radius,
    mean_weight,
    ideal_gas_density,
    equilibrium_temp,
)
from .geometry import (
    transit_path_matrix,
)
from .chem import (
    Network,
    chemistry,
)
