"""init_genome / set_default_ref commands (ref: src/python/init_genome.py,
set_default_ref.py)."""

import argparse

from ..genome.init_genome import init_genome
from ..genome.refdir import references_root, set_default_ref


def main_init_genome(argv):
    p = argparse.ArgumentParser(prog="init_genome",
                                description="Init genome reference.")
    p.add_argument("name", help="genome name (e.g. hg19)")
    p.add_argument("--fasta_path", required=True,
                   help="reference genome FASTA (.fa or .fa.gz). "
                   "Unlike the reference implementation there is no UCSC "
                   "auto-download (no egress); provide the file.")
    p.add_argument("-f", "--force", action="store_true")
    p.add_argument("--no_default", action="store_true")
    p.add_argument("--no_sort", action="store_true")
    p.add_argument("-d", "--debug", action="store_true")
    p.add_argument("-@", "--threads", type=int, default=None,
                   help="(compat; the CpG scan is one vectorized pass)")
    args = p.parse_args(argv)
    if args.debug:
        from ..utils.log import set_verbose

        set_verbose()
    init_genome(
        args.name,
        args.fasta_path,
        force=args.force,
        set_default=not args.no_default,
        sort_chroms=not args.no_sort,
    )
    return 0


def main_set_default_ref(argv):
    p = argparse.ArgumentParser(prog="set_default_ref")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("name", nargs="?", help="genome name to set as default")
    g.add_argument("--name", dest="name_opt", default=None,
                   help="genome name to set as default")
    g.add_argument("-ls", "--list_refs", action="store_true")
    args = p.parse_args(argv)
    if args.list_refs:
        import os
        import os.path as op

        root = references_root()
        default = None
        link = op.join(root, "default")
        if op.islink(link):
            default = os.readlink(link)
        for d in sorted(os.listdir(root)):
            if d == "default" or not op.isdir(op.join(root, d)):
                continue
            mark = " *" if d == default else ""
            print(d + mark)
        return 0
    set_default_ref(args.name or args.name_opt)
    return 0
