"""beta_to_blocks / beta_to_table conformance vs the reference Python
implementation (runs directly; needs no external tools)."""

import os
import os.path as op
import subprocess
import sys

import numpy as np
import pytest

from tests.synth import random_beta
from wgbs_tools_tpu.cli.cmd_beta import reduce_beta_to_blocks
from wgbs_tools_tpu.formats.beta import save_beta, trim_to_uint
from wgbs_tools_tpu.formats.blocks import load_blocks

REF_PY = "/root/reference/src/python"


@pytest.fixture(scope="module")
def block_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("b2b")
    rng = np.random.default_rng(11)
    n_sites = 4000
    bounds = np.sort(rng.choice(np.arange(2, n_sites), size=81, replace=False))
    with open(d / "blocks.bed", "w") as f:
        for s, e in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
            f.write(f"chr1\t{s * 10}\t{e * 10}\t{s}\t{e}\n")
    data = random_beta(rng, n_sites, max_cov=40)
    beta = str(d / "x.beta")
    save_beta(beta, data)
    return d, beta, data


def test_beta_to_blocks_matches_reference(block_data, tmp_path):
    d, beta, data = block_data
    env = dict(os.environ, PYTHONPATH=REF_PY)
    p = subprocess.run(
        [sys.executable, op.join(REF_PY, "beta_to_blocks.py"), beta,
         "-b", str(d / "blocks.bed"), "-o", str(tmp_path), "-f", "-@", "2"],
        env=env, capture_output=True,
    )
    if p.returncode != 0 and not op.isfile(str(tmp_path / "x.bin")):
        pytest.skip(f"reference beta_to_blocks unavailable: "
                    f"{p.stderr.decode()[:300]}")
    ref = np.fromfile(str(tmp_path / "x.bin"), dtype=np.uint8).reshape(-1, 2)

    blocks = load_blocks(str(d / "blocks.bed"))
    mine = trim_to_uint(reduce_beta_to_blocks(beta, blocks))
    assert mine.shape == ref.shape
    assert (mine == ref).all()
