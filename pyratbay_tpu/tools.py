"""Shared utilities: timers, formatted writers, depth conversions.

Reference behavior: pyratbay/tools/tools.py (Timer :832, Formatted_Write
:736, radius_to_depth/depth_to_radius :1119-1215, divisors :314).
"""
import time

import numpy as np

from . import constants as pc

__all__ = [
    'Timer',
    'Formatted_Write',
    'divisors',
    'radius_to_depth',
    'depth_to_radius',
    'ifirst',
    'ilast',
]


class Timer:
    """Wall-clock delta timer: each clock() returns seconds since the
    previous call."""

    def __init__(self):
        self.t0 = time.time()

    def clock(self):
        t1 = time.time()
        delta = t1 - self.t0
        self.t0 = t1
        return delta


class Formatted_Write:
    """Accumulate formatted lines into a text blob (str(obj) builder).

    fw = Formatted_Write(); fw.write('x = {:.3f}', 1.0); fw.text
    """

    def __init__(self, indent=0, fmt=None, edge=None, prec=None):
        self.text = ''
        self.indent = indent
        self.fmt = fmt
        self.edge = edge
        self.prec = prec

    def write(self, text, *args, fmt=None, edge=None, prec=None):
        fmt = fmt if fmt is not None else self.fmt
        edge = edge if edge is not None else self.edge
        prec = prec if prec is not None else self.prec
        options = {}
        if fmt is not None:
            options['formatter'] = fmt
        if prec is not None:
            options['precision'] = prec
        if edge is not None:
            options['edgeitems'] = edge
            options['threshold'] = 2 * edge
        if options:
            with np.printoptions(**options):
                str_args = [
                    str(arg) if isinstance(arg, np.ndarray) else arg
                    for arg in args
                ]
                line = text.format(*str_args)
        else:
            line = text.format(*args) if args else text
        pad = ' ' * self.indent
        self.text += ''.join(
            pad + subline + '\n' for subline in line.split('\n')
        )


def divisors(number):
    """Integer divisors of number, ascending."""
    return np.array([
        i for i in range(1, number + 1) if number % i == 0
    ])


def ifirst(data, default_ret=-1):
    """Index of the first True element (or default_ret if none)."""
    data = np.asarray(data, bool)
    idx = np.argmax(data)
    if not data[idx]:
        return default_ret
    return int(idx)


def ilast(data, default_ret=-1):
    """Index of the last True element (or default_ret if none)."""
    data = np.asarray(data, bool)
    idx = len(data) - 1 - np.argmax(data[::-1])
    if not data[idx]:
        return default_ret
    return int(idx)


def radius_to_depth(rprs, rprs_err):
    """Transit radius ratio -> depth: depth = (Rp/Rs)^2, with errors."""
    rprs = np.asarray(rprs)
    rprs_err = np.asarray(rprs_err)
    depth = rprs**2
    depth_err = 2.0 * rprs * rprs_err
    return depth, depth_err


def depth_to_radius(depth, depth_err):
    """Transit depth -> radius ratio: Rp/Rs = sqrt(depth), with errors."""
    depth = np.asarray(depth)
    depth_err = np.asarray(depth_err)
    rprs = np.sqrt(depth)
    rprs_err = 0.5 * depth_err / rprs
    return rprs, rprs_err
