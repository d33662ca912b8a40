"""Reference-binary oracle harness.

Compiles the reference's C++ stream kernels (from the read-only checkout at
/root/reference) into a gitignored build dir and runs them on test inputs to
produce golden outputs. The binaries are test oracles only — nothing from the
reference tree ships in this framework.
"""

import os
import os.path as op
import subprocess

import pytest

REFERENCE = os.environ.get("WGBS_REFERENCE", "/root/reference")
BUILD_DIR = op.join(op.dirname(op.abspath(__file__)), ".oracle_build")

_SOURCES = {
    "stdin2beta": ["src/pat2beta/stdin2beta.cpp"],
    "pat_sampler": ["src/pat_sampler/sampler.cpp"],
    "segmentor": ["src/segment_betas/main.cpp", "src/segment_betas/segmentor.cpp"],
    "cview": ["src/cview/cview.cpp", "src/pipeline_wgbs/patter_utils.cpp"],
    "homog": ["src/homog/homog.cpp", "src/pipeline_wgbs/patter_utils.cpp"],
    "match_maker": [
        "src/pipeline_wgbs/match_maker.cpp",
        "src/pipeline_wgbs/patter_utils.cpp",
    ],
    "patter": [
        "src/pipeline_wgbs/main.cpp",
        "src/pipeline_wgbs/patter.cpp",
        "src/pipeline_wgbs/ont.cpp",
        "src/pipeline_wgbs/patter_utils.cpp",
    ],
    "mask_pat": ["src/pat2beta/mask_pat.cpp", "src/pipeline_wgbs/patter_utils.cpp"],
    "stdin2pairs": ["src/pat2beta/stdin2pairs.cpp"],
    "snp_patter": [
        "src/pipeline_wgbs/snp_patter.cpp",
        "src/pipeline_wgbs/patter_utils.cpp",
    ],
    "add_cpg_counts": [
        "src/pipeline_wgbs/add_cpg_counts.cpp",
        "src/pipeline_wgbs/patter_utils.cpp",
    ],
}

_INCLUDE_DIRS = ["src/pipeline_wgbs", "src/cview", "src/homog", "src/segment_betas"]


def oracle(name):
    """Return path to a compiled reference binary, building it on demand.

    Skips the calling test if the reference tree or toolchain is unavailable.
    """
    if not op.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    os.makedirs(BUILD_DIR, exist_ok=True)
    out = op.join(BUILD_DIR, name)
    if op.isfile(out):
        return out
    srcs = [op.join(REFERENCE, s) for s in _SOURCES[name]]
    if not all(op.isfile(s) for s in srcs):
        pytest.skip(f"reference sources for {name} not found")
    cmd = ["g++", "-std=c++11", "-O2", "-o", out] + srcs
    for d in _INCLUDE_DIRS:
        cmd += ["-I", op.join(REFERENCE, d)]
    try:
        subprocess.check_call(cmd, stderr=subprocess.DEVNULL)
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip(f"failed to compile reference oracle {name}")
    return out


def run_oracle(name, args, stdin_bytes=b"", check=True):
    exe = oracle(name)
    p = subprocess.run(
        [exe] + [str(a) for a in args],
        input=stdin_bytes,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    if check and p.returncode != 0:
        raise RuntimeError(
            f"oracle {name} failed rc={p.returncode}: {p.stderr.decode()[:500]}"
        )
    return p.stdout
