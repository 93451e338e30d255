"""Packaged physical data: species properties, isotope tables, and
TIPS-2021 partition functions.
"""
import functools
import os

import numpy as np

_DATA_DIR = os.path.dirname(os.path.realpath(__file__))


@functools.lru_cache(maxsize=1)
def isotopes_table():
    """Isotopologue data (HITRAN + ExoMol catalogues).

    Returns dict of arrays: molecule, hitran_iso, exomol_iso, iso_ratio,
    iso_mass.
    """
    with np.load(os.path.join(_DATA_DIR, 'isotopes.npz')) as f:
        return {key: f[key] for key in f.files}


@functools.lru_cache(maxsize=1)
def tips_table():
    """TIPS 2021 partition functions (Gamache et al. 2021).

    Returns (data, temp) where data maps molecule -> {isotope: pf_row}.
    """
    with np.load(os.path.join(_DATA_DIR, 'tips_2021.npz')) as f:
        mols = f['molecule']
        isos = f['isotope']
        ntemp = f['ntemp']
        pf = f['pf']
        temp = f['temp']
        mol_ids = dict(zip(f['mol_id_keys'], f['mol_id_names']))
    data = {}
    for i, mol in enumerate(mols):
        data.setdefault(str(mol), {})[str(isos[i])] = pf[i, :ntemp[i]]
    return data, temp, mol_ids


def get_iso(molname):
    """Isotope names (exomol notation), masses, and ratios for a molecule.

    Order follows the isotopes table (HITRAN order first).
    """
    table = isotopes_table()
    sel = table['molecule'] == molname
    return (
        [str(iso) for iso in table['exomol_iso'][sel]],
        list(table['iso_mass'][sel]),
        list(table['iso_ratio'][sel]),
    )
