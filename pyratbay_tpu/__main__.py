"""Command-line entry point: pbay-tpu -c config.cfg

Reference behavior: pyratbay/__main__.py (pbay console script).
"""
import argparse
import sys


def main():
    parser = argparse.ArgumentParser(
        description='TPU-native radiative transfer in a Bayesian framework',
        prog='pbay-tpu',
    )
    parser.add_argument(
        '-v', '--version', action='store_true',
        help='show the version number and exit',
    )
    parser.add_argument(
        '-c', '--cfile', metavar='CONFIG', help='configuration file to run',
    )
    parser.add_argument(
        '--root', default=None,
        help="path substituted for '{ROOT}' in config paths",
    )
    parser.add_argument(
        '-pf', nargs='*', metavar='ARGS',
        help='partition-function tools: "-pf tips MOLECULE [OUTFILE]"',
    )
    args = parser.parse_args()

    if args.version:
        from .version import __version__
        print(f'pyratbay_tpu version {__version__}')
        return 0

    if args.pf is not None:
        from .opacity import partitions
        from .io import io as pio
        if len(args.pf) >= 2 and args.pf[0] == 'tips':
            pf, isotopes, temp = partitions.tips(args.pf[1])
            outfile = (
                args.pf[2] if len(args.pf) > 2
                else f'PF_tips_{args.pf[1]}.dat'
            )
            pio.write_pf(outfile, pf, isotopes, temp)
            print(f"Written partition-function file: '{outfile}'")
            return 0
        print('Usage: pbay-tpu -pf tips MOLECULE [OUTFILE]')
        return 1

    if args.cfile is None:
        parser.print_help()
        return 1

    from .driver import run
    run(args.cfile, root=args.root)
    return 0


if __name__ == '__main__':
    sys.exit(main())
