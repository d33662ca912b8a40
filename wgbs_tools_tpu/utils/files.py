"""File-path utilities (ref: src/python/utils_wgbs.py:355-454)."""

import os
import os.path as op
import sys
from pathlib import Path

from .log import eprint


class IllegalArgumentError(ValueError):
    pass


def splitextgz(input_file):
    """fname.pat.gz -> (fname, '.pat.gz'); fname.beta -> (fname, '.beta')."""
    b, suff = op.splitext(input_file)
    if suff == ".gz":
        b, suff2 = op.splitext(b)
        suff = suff2 + suff
    return b, suff


def pretty_name(fpath):
    return splitextgz(op.basename(fpath))[0]


def mkdirp(dpath):
    if dpath:
        Path(dpath).mkdir(parents=True, exist_ok=True)
    return dpath


def safe_remove(fpath):
    if fpath is not None and op.isfile(fpath):
        os.remove(fpath)


def delete_or_skip(output_file, force):
    """Idempotency at file granularity (ref: utils_wgbs.py:435-454):
    existing output + force -> delete; existing + no force -> skip (False)."""
    if output_file is None or output_file == sys.stdout or output_file == "/dev/stdout":
        return True
    if op.isfile(output_file):
        if force:
            for f in (output_file, output_file + ".csi", output_file + ".cdx",
                      output_file + ".cdx.npz"):
                safe_remove(f)
        else:
            eprint(
                f"File {output_file} already exists. Skipping it. "
                "Use [-f] flag to force overwrite."
            )
            return False
    return True


def validate_single_file(fpath, suff=None):
    if fpath is None:
        raise IllegalArgumentError("Input file is None")
    if not op.isfile(fpath):
        raise IllegalArgumentError(f"No such file: {fpath}")
    if suff is not None and not fpath.endswith(suff):
        raise IllegalArgumentError(f"file {fpath} must end with {suff}")
    return fpath


def validate_file_list(files, force_suff=None, min_len=1):
    if len(files) < min_len:
        raise IllegalArgumentError(
            f"Input error: at least {min_len} input files must be given"
        )
    first = files[0]
    if len(first) == 1:
        raise IllegalArgumentError(f"Input is not a list of files: {files}")
    if force_suff is not None and not first.endswith(force_suff):
        raise IllegalArgumentError(f"Input file {first} must end with {force_suff}")
    suff = splitextgz(first)[1]
    for fpath in files:
        validate_single_file(fpath, suff)
