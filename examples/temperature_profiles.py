"""Cookbook: parametric temperature-profile models.

Mirrors the reference's temperature_profiles cookbook: isothermal,
Guillot (2010) three-channel Eddington, and Madhusudhan & Seager
(2009) three-zone profiles over a log-pressure grid.

    python examples/temperature_profiles.py
"""
import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np

from pyratbay_tpu.atmosphere import pressure
from pyratbay_tpu.atmosphere.profiles import (
    guillot_tp, isothermal_tp, madhu_tp,
)

press = pressure('1e-7 bar', '1e2 bar', 41)

iso = isothermal_tp(press)([1500.0])

# Guillot: log kappa', log gamma1, log gamma2, alpha, T_irr, T_int
guillot = guillot_tp(press)([-6.0, -0.25, 0.0, 0.0, 1200.0, 100.0])

# Madhu: log p1, log p2, log p3, a1, a2, T0 (non-inverted)
madhu = madhu_tp(press)([-3.5, -1.5, 1.0, 1.0, 1.0, 900.0])

bar = np.asarray(press)
for name, prof in [('isothermal', iso), ('guillot', guillot),
                   ('madhu', madhu)]:
    prof = np.asarray(prof)
    print(f'{name:>10s}: T(top) {prof[0]:7.1f} K   '
          f'T(1 bar) {prof[np.argmin(np.abs(bar - 1.0))]:7.1f} K   '
          f'T(bottom) {prof[-1]:7.1f} K')
    assert np.all(np.isfinite(prof)) and np.all(prof > 0)
print('all profiles finite and positive: OK')
