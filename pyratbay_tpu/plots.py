"""Plotting: spectra, contribution functions, temperature profiles,
abundances, and posterior distributions.

Reference behavior: pyratbay/plots/plots.py (matplotlib figures).
"""
import numpy as np

from . import constants as pc

__all__ = [
    'spectrum',
    'temperature',
    'abundance',
    'contribution',
    'posteriors',
    'alphatize',
]


def _mpl():
    import matplotlib
    matplotlib.use('Agg', force=False)
    import matplotlib.pyplot as plt
    return plt


def alphatize(colors, alpha, background='white'):
    """Blend colors toward a background as if drawn with given alpha."""
    import matplotlib.colors as mc
    single = isinstance(colors, str)
    if single:
        colors = [colors]
    bg = np.array(mc.to_rgb(background))
    out = [
        tuple(alpha * np.array(mc.to_rgb(c)) + (1 - alpha) * bg)
        for c in colors
    ]
    return out[0] if single else out


def spectrum(
        spectrum, wl, rt_path='transit',
        data=None, uncert=None, band_wl=None, bandflux=None,
        logxticks=None, gaussbin=2.0, yran=None, filename=None, ax=None,
    ):
    """Plot a transmission/emission/eclipse spectrum (+ data points)."""
    from scipy.ndimage import gaussian_filter1d
    plt = _mpl()
    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 4.5), constrained_layout=True)
    if rt_path == 'transit':
        scale, label = 100.0, 'Transit depth (Rp/Rs)$^2$ (%)'
    elif rt_path == 'eclipse':
        scale, label = 1e6, 'Eclipse depth Fp/Fs (ppm)'
    else:
        scale, label = 1.0, r'Flux (erg s$^{-1}$ cm$^{-2}$ cm)'
    smooth = gaussian_filter1d(spectrum, gaussbin) if gaussbin else spectrum
    ax.plot(wl, scale * np.asarray(smooth), color='xkcd:blue', lw=1.0,
            label='model')
    if bandflux is not None and band_wl is not None:
        ax.plot(band_wl, scale * np.asarray(bandflux), 'o', ms=4,
                color='orange', mec='k', mew=0.5, label='band-integrated')
    if data is not None and band_wl is not None:
        ax.errorbar(
            band_wl, scale * np.asarray(data),
            yerr=None if uncert is None else scale * np.asarray(uncert),
            fmt='o', ms=4, color='0.2', ecolor='0.4', label='data',
        )
    ax.set_xscale('log')
    if logxticks is not None:
        ax.set_xticks(logxticks)
        ax.get_xaxis().set_major_formatter(
            __import__('matplotlib').ticker.ScalarFormatter())
    if yran is not None:
        ax.set_ylim(yran)
    ax.set_xlabel('Wavelength (um)')
    ax.set_ylabel(label)
    ax.legend(loc='best', fontsize=9)
    if filename is not None:
        ax.figure.savefig(filename, dpi=150)
    return ax


def temperature(
        pressure, profiles=None, labels=None, bounds=None,
        filename=None, ax=None,
    ):
    """Plot temperature profiles (with optional credible-region bounds).

    pressure in bar; profiles: array or list of [nlayers] arrays;
    bounds: (low1, high1[, low2, high2]) interquantile envelopes.
    """
    plt = _mpl()
    if ax is None:
        fig, ax = plt.subplots(figsize=(5, 5.5), constrained_layout=True)
    if profiles is not None:
        profiles = np.atleast_2d(np.asarray(profiles))
        for i, prof in enumerate(profiles):
            label = labels[i] if labels is not None else None
            ax.plot(prof, pressure, lw=1.5, label=label)
    if bounds is not None and len(bounds) >= 2:
        ax.fill_betweenx(
            pressure, bounds[0], bounds[1], alpha=0.35,
            color='royalblue',
        )
        if len(bounds) == 4:
            ax.fill_betweenx(
                pressure, bounds[2], bounds[3], alpha=0.2,
                color='royalblue',
            )
    ax.set_yscale('log')
    ax.invert_yaxis()
    ax.set_xlabel('Temperature (K)')
    ax.set_ylabel('Pressure (bar)')
    if labels is not None:
        ax.legend(loc='best', fontsize=9)
    if filename is not None:
        ax.figure.savefig(filename, dpi=150)
    return ax


def abundance(
        vmr, pressure, species, colors=None, xlim=None,
        filename=None, ax=None,
    ):
    """Plot VMR profiles [nlayers, nspecies] vs pressure (bar)."""
    plt = _mpl()
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 5.5), constrained_layout=True)
    vmr = np.asarray(vmr)
    for i, spec in enumerate(species):
        color = None if colors is None else colors[i % len(colors)]
        ax.plot(vmr[:, i], pressure, lw=1.5, label=spec, color=color)
    ax.set_xscale('log')
    ax.set_yscale('log')
    ax.invert_yaxis()
    if xlim is not None:
        ax.set_xlim(xlim)
    ax.set_xlabel('Volume mixing ratio')
    ax.set_ylabel('Pressure (bar)')
    ax.legend(loc='best', fontsize=8, ncol=2)
    if filename is not None:
        ax.figure.savefig(filename, dpi=150)
    return ax


def contribution(
        cf, wl, pressure, filename=None, ax=None,
    ):
    """Plot a contribution-function (or transmittance) map
    [nlayers, nwave] vs wavelength and pressure."""
    plt = _mpl()
    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 4.5), constrained_layout=True)
    mesh = ax.pcolormesh(
        wl, pressure, np.asarray(cf), cmap='viridis', shading='auto',
    )
    ax.set_yscale('log')
    ax.invert_yaxis()
    ax.set_xscale('log')
    ax.set_xlabel('Wavelength (um)')
    ax.set_ylabel('Pressure (bar)')
    ax.figure.colorbar(mesh, ax=ax, label='Contribution')
    if filename is not None:
        ax.figure.savefig(filename, dpi=150)
    return ax


def posteriors(
        posterior, pnames=None, bestp=None, nbins=30,
        filename=None,
    ):
    """Corner-style posterior plot: marginal histograms + pairwise maps."""
    plt = _mpl()
    posterior = np.asarray(posterior)
    npars = posterior.shape[1]
    fig, axes = plt.subplots(
        npars, npars, figsize=(2.2 * npars, 2.2 * npars),
        constrained_layout=True, squeeze=False,
    )
    for i in range(npars):
        for j in range(npars):
            ax = axes[i][j]
            if j > i:
                ax.axis('off')
                continue
            if i == j:
                ax.hist(
                    posterior[:, i], bins=nbins, color='royalblue',
                    density=True,
                )
                if bestp is not None:
                    ax.axvline(bestp[i], color='crimson', lw=1.2)
            else:
                ax.hist2d(
                    posterior[:, j], posterior[:, i], bins=nbins,
                    cmap='Blues',
                )
                if bestp is not None:
                    ax.plot(bestp[j], bestp[i], '+', color='crimson')
            if i == npars - 1 and pnames is not None:
                ax.set_xlabel(pnames[j], fontsize=8)
            if j == 0 and i > 0 and pnames is not None:
                ax.set_ylabel(pnames[i], fontsize=8)
            ax.tick_params(labelsize=7)
    if filename is not None:
        fig.savefig(filename, dpi=120)
    return axes
