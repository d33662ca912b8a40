"""Genome reference directory management.

Mirrors the reference's `references/<name>/` layout with a `default` symlink
(ref: src/python/utils_wgbs.py:53-115, set_default_ref.py:35-49), rooted at
$WGBS_TPU_REFDIR (default: <repo>/references).
"""

import os
import os.path as op
from pathlib import Path

from ..utils import IllegalArgumentError, mkdirp
from .cpg_index import CpGIndex


def references_root():
    env = os.environ.get("WGBS_TPU_REFDIR")
    if env:
        return mkdirp(env)
    pkg_root = Path(op.realpath(__file__)).parent.parent.parent
    return mkdirp(op.join(str(pkg_root), "references"))


def genome_dir(name=None):
    name = name or "default"
    root = references_root()
    refdir = op.join(root, name)
    if name == "default":
        if not op.islink(refdir):
            raise IllegalArgumentError(
                "No default genome set. Run init_genome or set_default_ref."
            )
        refdir = str(Path(refdir).resolve())
    if not op.isdir(refdir):
        raise IllegalArgumentError(f"Invalid reference name: {name}")
    return refdir


def resolve_genome_name(name=None):
    if name is None or name == "default":
        refdir = op.join(references_root(), "default")
        if not op.islink(refdir):
            raise IllegalArgumentError("No default genome set.")
        return os.readlink(refdir)
    return name


def set_default_ref(name):
    """Point the `default` symlink at references/<name>."""
    root = references_root()
    target = op.join(root, name)
    if not op.isdir(target):
        raise IllegalArgumentError(f"Invalid reference name: {name}")
    link = op.join(root, "default")
    if op.islink(link):
        os.unlink(link)
    elif op.exists(link):
        raise IllegalArgumentError(f"{link} exists and is not a symlink")
    os.symlink(name, link)


class Genome:
    """Loaded genome handle: CpGIndex + auxiliary paths.

    Equivalent of GenomeRefPaths (ref: utils_wgbs.py:53-115), but the
    dictionary is the in-memory CpGIndex rather than tabix-queried files.
    """

    def __init__(self, name=None):
        self.name = resolve_genome_name(name)
        self.refdir = genome_dir(name)
        self._index = None

    @property
    def index(self) -> CpGIndex:
        if self._index is None:
            self._index = CpGIndex.load(self.refdir, name=self.name)
        return self._index

    def join(self, fname, validate=False):
        path = op.join(self.refdir, fname)
        if not op.isfile(path):
            if op.isfile(path + ".gz"):
                return path + ".gz"
            if validate:
                raise IllegalArgumentError(f"Invalid reference path: {path}")
            return None
        return path

    @property
    def annotations(self):
        return self.join("annotations.bed.gz")

    @property
    def blocks(self):
        return self.join("blocks.bed.gz")

    @property
    def blacklist(self):
        return self.join("blacklist.bed")

    @property
    def whitelist(self):
        return self.join("whitelist.bed")

    @property
    def ilmn2cpg_dict(self):
        return self.join("ilmn2CpG.tsv.gz")

    def get_nr_sites(self):
        return self.index.nr_sites

    def get_chroms(self):
        return tuple(self.index.chrom_names)
