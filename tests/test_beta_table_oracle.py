"""beta_to_table conformance vs the reference Python implementation.

The reference's table builder (beta_to_table.py) reads blocks and beta
files directly (no external tools), so it runs as-is with PYTHONPATH
pointed at /root/reference/src/python.
"""

import os
import os.path as op
import subprocess
import sys

import numpy as np
import pytest

from wgbs_tools_tpu.cli.cmd_beta import main_beta_to_table
from wgbs_tools_tpu.formats.beta import save_beta

REF_PY = "/root/reference/src/python"


@pytest.fixture(scope="module")
def table_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("beta_table")
    rng = np.random.default_rng(99)
    n_sites = 4000
    n_blocks = 90
    bounds = np.sort(rng.choice(np.arange(2, n_sites), size=n_blocks + 1,
                                replace=False))
    starts, ends = bounds[:-1], bounds[1:]
    with open(d / "blocks.bed", "w") as f:
        for s, e in zip(starts.tolist(), ends.tolist()):
            f.write(f"chr1\t{s * 25}\t{e * 25}\t{s}\t{e}\n")

    betas = []
    rows = ["name,group"]
    for gname, k in (("A", 2), ("B", 3)):
        for i in range(k):
            p = rng.random(n_sites)
            cov = rng.integers(0, 12, size=n_sites)  # some zero-cov sites
            meth = rng.binomial(cov, p)
            name = f"t{gname}{i}"
            path = str(d / f"{name}.beta")
            save_beta(path, np.stack([meth, cov], axis=1))
            betas.append(path)
            rows.append(f"{name},{gname}")
    (d / "groups.csv").write_text("\n".join(rows) + "\n")
    return d, betas


def run_reference(d, betas, out, groups=True):
    env = dict(os.environ, PYTHONPATH=REF_PY)
    cmd = [sys.executable, op.join(REF_PY, "beta_to_table.py"),
           str(d / "blocks.bed"), "--betas"] + betas + \
        ["-o", out, "-c", "4", "--digits", "3", "--threads", "2"]
    if groups:
        cmd += ["-g", str(d / "groups.csv")]
    p = subprocess.run(cmd, env=env, capture_output=True)
    if p.returncode != 0:
        pytest.skip(
            f"reference beta_to_table unavailable: {p.stderr.decode()[:300]}")
    return out


def load_table(path):
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = [line.rstrip("\n").split("\t") for line in f]
    cols = {h: [r[i] for r in rows] for i, h in enumerate(header)}
    return cols


def _vals(col):
    return np.array([np.nan if v in ("NA", "", "nan") else float(v)
                     for v in col])


@pytest.mark.parametrize("grouped", [True, False])
def test_beta_to_table_matches_reference(table_data, tmp_path, grouped):
    d, betas = table_data
    ref_path = run_reference(d, betas, str(tmp_path / "ref.tsv"),
                             groups=grouped)
    mine_path = str(tmp_path / "mine.tsv")
    argv = [str(d / "blocks.bed"), "--betas"] + betas + \
        ["-c", "4", "-o", mine_path, "--digits", "3", "--chunk_size", "40"]
    if grouped:
        argv += ["-g", str(d / "groups.csv")]
    main_beta_to_table(argv)

    ref = load_table(ref_path)
    mine = load_table(mine_path)
    value_cols = [c for c in ref
                  if c not in ("chr", "start", "end", "startCpG", "endCpG")]
    assert value_cols, f"no value columns in reference output: {list(ref)}"
    for key in ("startCpG", "endCpG"):
        assert mine[key] == ref[key]
    for c in value_cols:
        assert c in mine, f"missing column {c} (have {list(mine)})"
        a, b = _vals(mine[c]), _vals(ref[c])
        assert (np.isnan(a) == np.isnan(b)).all(), c
        ok = np.isnan(a) | (np.abs(a - b) < 2e-3)
        assert ok.all(), (c, np.nonzero(~ok)[0][:5])
