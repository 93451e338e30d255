"""Opacity sources.

Every model follows the same functional contract: a setup call captures
static data (wavenumber grid, tabulated cross sections, line data) and
returns lightweight objects whose `cross_section` / `extinction` methods
are pure JAX functions of the runtime state (temperature, densities,
retrieval parameters) -- vmap/jit/grad safe.
"""
from .rayleigh import Rayleigh
from .clouds import Lecavelier, CCSgray, Deck
from .h_ion import HydrogenIon
from .alkali import SodiumVdW, PotassiumVdW, get_alkali_model
from .cia import CIA
from .line_sample import LineSample
