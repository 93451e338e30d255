"""TPU worker (launched by test_tpu_hw.py): evaluate the pallas wing
kernel with approx_recip=True and =False on the same synthetic inputs
and save both, so the parent can pin the approximate-reciprocal +
Newton-step chain against the full divide on real hardware (the
interpreter path always divides, so CI alone never exercises it).
"""
import os

import numpy as np


def main():
    import jax

    out_file = os.environ['PBT_RECIP_OUT']
    backend = jax.default_backend()
    if backend != 'tpu':
        np.savez(out_file, backend=backend)
        return

    from pyratbay_tpu.opacity.lbl_pallas import wing_sigma

    rng = np.random.default_rng(7)
    ntiles, tile, lmax, ncell = 4, 128, 256, 2
    wn = 6000.0 + np.arange(ntiles * tile) * 0.01
    wn = wn.reshape(ntiles, tile)
    wn_hi = wn.astype(np.float32)
    wn_lo = (wn - wn_hi.astype(np.float64)).astype(np.float32)
    lwn = rng.uniform(5990.0, 6010.0 + ntiles * tile * 0.01,
                      (ntiles, lmax))
    lwn = np.sort(lwn, axis=1)
    lwn_hi = lwn.astype(np.float32)
    lwn_lo = (lwn - lwn_hi.astype(np.float64)).astype(np.float32)
    c1 = rng.lognormal(-3, 2, (ncell, ntiles, lmax)).astype(np.float32)
    y2 = rng.lognormal(-4, 1, (ncell, ntiles, lmax)).astype(np.float32)
    inv_ad = rng.uniform(5.0, 50.0, (ncell, ntiles, lmax)).astype(
        np.float32)

    args = (wn_hi, wn_lo, lwn_hi, lwn_lo, c1, y2, inv_ad)
    approx = np.asarray(wing_sigma(
        *args, margin=0.3, cutoff=25.0, approx_recip=True,
    ))
    exact = np.asarray(wing_sigma(
        *args, margin=0.3, cutoff=25.0, approx_recip=False,
    ))
    np.savez(out_file, backend=backend, approx=approx, exact=exact)


if __name__ == '__main__':
    main()
