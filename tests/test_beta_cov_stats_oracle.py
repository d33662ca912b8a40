"""beta_cov / beta_stats conformance vs the reference Python CLIs.

The reference resolves its reference-genome dir relative to its own
``__file__`` (utils_wgbs.py:90), so the harness copies the reference's
python sources into a temp tree and points ``references/default`` at a
refdir produced by OUR ``init_genome`` — which doubles as a check that the
reference-compatible artifacts we emit (CpG.bed.gz, chrome.size,
CpG.chrome.size, rev.CpG.bed.gz) are accepted by the reference verbatim.
"""

import io
import os
import os.path as op
import shutil
import subprocess
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

from tests.synth import make_fasta
from wgbs_tools_tpu.cli.cmd_beta import main_beta_cov, main_beta_stats
from wgbs_tools_tpu.formats.beta import save_beta

REF_PY = "/root/reference/src/python"


@pytest.fixture(scope="module")
def ref_cli(tmp_path_factory, mini_genome):
    """Temp copy of the reference python package wired to our refdir."""
    if not op.isdir(REF_PY):
        pytest.skip("reference tree not available")
    d = tmp_path_factory.mktemp("refcli")
    pkg = d / "src" / "python"
    pkg.parent.mkdir()
    shutil.copytree(REF_PY, pkg)
    refs = d / "references"
    refs.mkdir()
    (refs / "mini").symlink_to(mini_genome.refdir)
    (refs / "default").symlink_to("mini")
    return str(pkg)


@pytest.fixture(scope="module")
def cov_betas(tmp_path_factory, mini_genome, rng):
    d = tmp_path_factory.mktemp("covbetas")
    n = mini_genome.index.nr_sites
    paths = []
    for i in range(2):
        cov = rng.integers(0, 9, size=n)
        meth = rng.binomial(cov, rng.random(n))
        p = str(d / f"c{i}.beta")
        save_beta(p, np.stack([meth, cov], axis=1))
        paths.append(p)
    # blocks bed over part of chr1 (5 columns, sorted)
    bounds = np.sort(rng.choice(np.arange(2, n // 2), size=31, replace=False))
    with open(d / "blocks.bed", "w") as f:
        loci = mini_genome.index.loci
        for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
            f.write(f"chr1\t{loci[s-1]}\t{loci[e-2]+1}\t{s}\t{e}\n")
    return d, paths


def run_ref(ref_cli, script, args):
    p = subprocess.run([sys.executable, op.join(ref_cli, script)] + args,
                       capture_output=True)
    if p.returncode != 0:
        pytest.skip(f"reference {script} unavailable: "
                    f"{p.stderr.decode()[:300]}")
    return p.stdout.decode()


def run_mine(fn, argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        fn(argv)
    return buf.getvalue()


def test_beta_cov_whole_genome(ref_cli, cov_betas):
    d, paths = cov_betas
    ref = run_ref(ref_cli, "beta_cov.py", paths + ["--threads", "1"])
    mine = run_mine(main_beta_cov, paths)
    assert mine.strip().splitlines() == ref.strip().splitlines()


def test_beta_cov_bed_file(ref_cli, cov_betas):
    d, paths = cov_betas
    bed = str(d / "blocks.bed")
    ref = run_ref(ref_cli, "beta_cov.py",
                  paths + ["-L", bed, "--threads", "1"])
    mine = run_mine(main_beta_cov, paths + ["-L", bed])
    assert mine.strip().splitlines() == ref.strip().splitlines()


def test_beta_stats_whole_genome(ref_cli, cov_betas):
    d, paths = cov_betas
    ref = run_ref(ref_cli, "beta_stats.py", paths + ["--threads", "1"])
    mine = run_mine(main_beta_stats, paths)
    # reference prints a transposed pandas frame; parse both into
    # {name: (mean_meth_pct, covered, max? , mean_depth)} and compare values
    ref_rows = {}
    lines = [l for l in ref.splitlines() if l.strip()]
    header = lines[0].split()
    for line in lines[1:]:
        t = line.split()
        name = t[0]
        vals = dict(zip(["mean_meth", "covered", "covered10", "max_depth",
                         "mean_depth"],
                        [v.replace(",", "") for v in t[1:]]))
        ref_rows[name] = vals
    assert ref_rows, f"unparsed reference output: {ref!r}"
    for line in mine.strip().splitlines()[1:]:
        name, mean_meth, covered, total, mean_depth = line.split("\t")
        r = ref_rows[name]
        assert abs(float(mean_meth) * 100 - float(r["mean_meth"])) < 0.02, \
            (name, mean_meth, r)
        assert int(covered) == int(r["covered"])
        assert abs(float(mean_depth) - float(r["mean_depth"])) < 0.01
