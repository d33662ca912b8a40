"""Multi-process (emulated multi-host) execution: N OS processes join one
jax.distributed job, shard the pat input by site range, and assemble a beta
byte-identical to the single-process path (parallel/multihost.py)."""

import os
import os.path as op
import subprocess
import sys

import numpy as np
import pytest

from tests.synth import random_frags
from wgbs_tools_tpu.formats.pat import write_pat

REPO = op.dirname(op.dirname(op.abspath(__file__)))


@pytest.mark.parametrize("nproc,ldev", [(2, 2)])
def test_multiprocess_pat2beta_matches_single(tmp_path, nproc, ldev):
    n_sites = 4096
    frags = random_frags(np.random.default_rng(7), 4000, n_sites - 20,
                         max_len=14).sort().collapse()
    pat = str(tmp_path / "mh.pat.gz")
    write_pat(frags, pat)

    # single-process truth (host accumulator; integer adds -> exact)
    from wgbs_tools_tpu.pipeline.pat2beta import pat2beta

    class _G:
        nr_sites = n_sites

        def get_nr_sites(self):
            return n_sites

    single = pat2beta(pat, out_dir=str(tmp_path), genome=_G(),
                      sharded=False, out_path=str(tmp_path / "single.beta"))

    # the launcher spawns fresh python processes: they must not inherit this
    # test process's initialized-JAX state, only its env
    from wgbs_tools_tpu.parallel.multihost import run_pat2beta_multiprocess

    out = run_pat2beta_multiprocess(
        pat, str(tmp_path / "multi.beta"), n_sites,
        num_processes=nproc, local_devices=ldev, timeout=300)
    assert open(out, "rb").read() == open(single, "rb").read(), \
        "multi-process beta != single-process beta"


def test_multiprocess_worker_cli_badargs():
    r = subprocess.run(
        [sys.executable, "-m", "wgbs_tools_tpu.parallel.multihost"],
        capture_output=True, env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 2  # argparse usage error


def test_pat2beta_cli_procs(tmp_path, mini_genome):
    """`pat2beta --procs 2` routes through the multi-process launcher and
    produces the same beta as the single-process CLI."""
    from tests.synth import random_frags
    from wgbs_tools_tpu.cli.main import main as cli_main

    n_sites = mini_genome.get_nr_sites()
    frags = random_frags(np.random.default_rng(9), 1500, n_sites - 20,
                         max_len=12).sort().collapse()
    pat = str(tmp_path / "c.pat.gz")
    write_pat(frags, pat)
    assert cli_main(["pat2beta", pat, "-o", str(tmp_path)]) == 0
    single = open(tmp_path / "c.beta", "rb").read()
    assert cli_main(["pat2beta", pat, "-o", str(tmp_path), "-f",
                     "--procs", "2"]) == 0
    assert open(tmp_path / "c.beta", "rb").read() == single


def test_multiprocess_empty_process_range(tmp_path):
    """All fragments in process 0's site range: process 1 contributes only
    empty collective rounds, and the assembled beta is still exact."""
    from tests.synth import random_frags
    from wgbs_tools_tpu.parallel.multihost import run_pat2beta_multiprocess
    from wgbs_tools_tpu.pipeline.pat2beta import pat2beta

    n_sites = 4096
    # all starts in the first quarter of the site axis (process 0's rows)
    frags = random_frags(np.random.default_rng(11), 800, n_sites // 4 - 20,
                         max_len=10).sort().collapse()
    pat = str(tmp_path / "e.pat.gz")
    write_pat(frags, pat)

    class _G:
        nr_sites = n_sites

        def get_nr_sites(self):
            return n_sites

    single = pat2beta(pat, out_dir=str(tmp_path), genome=_G(),
                      sharded=False, out_path=str(tmp_path / "s.beta"))
    out = run_pat2beta_multiprocess(pat, str(tmp_path / "m.beta"), n_sites,
                                    num_processes=2, local_devices=2,
                                    timeout=300)
    assert open(out, "rb").read() == open(single, "rb").read()


def test_multiprocess_segment_matches_single(tmp_path, mini_genome):
    """2-process segment (chunk axis round-robined over jax.distributed
    workers, parts stitched on p0) == single-process segment_ranges."""
    from wgbs_tools_tpu.formats.beta import save_beta
    from wgbs_tools_tpu.models.segment import SegmentConfig, segment_ranges
    from wgbs_tools_tpu.parallel.multihost import run_segment_multiprocess

    nr = mini_genome.get_nr_sites()
    rng = np.random.default_rng(5)
    paths = []
    for i in range(2):
        cov = rng.integers(0, 20, size=nr).astype(np.int64)
        meth = rng.binomial(cov, 0.2 + 0.6 * ((np.arange(nr) // 400) % 2))
        p = str(tmp_path / f"m{i}.beta")
        save_beta(p, np.stack([meth, cov], axis=1))
        paths.append(p)
    ranges = [(1, nr + 1)]
    kw = dict(max_cpg=100, max_bp=100000, pseudo_count=15.0,
              chunk_size=1500, mode="exact")
    cfg = SegmentConfig(**kw)
    st, en = segment_ranges(paths, ranges, mini_genome.index, cfg)
    st2, en2 = run_segment_multiprocess(
        paths, ranges, str(tmp_path / "seg"), num_processes=2,
        local_devices=2, timeout=300, **kw)
    assert st2.tolist() == st.tolist()
    assert en2.tolist() == en.tolist()


def test_segment_cli_procs(tmp_path, mini_genome, capsys):
    """`segment --procs 2` produces the same blocks file as single-process."""
    from wgbs_tools_tpu.cli.main import main as cli_main
    from wgbs_tools_tpu.formats.beta import save_beta

    nr = mini_genome.get_nr_sites()
    rng = np.random.default_rng(6)
    cov = rng.integers(1, 15, size=nr).astype(np.int64)
    meth = rng.binomial(cov, 0.15 + 0.7 * ((np.arange(nr) // 300) % 2))
    b = str(tmp_path / "c.beta")
    save_beta(b, np.stack([meth, cov], axis=1))
    o1 = str(tmp_path / "b1.bed")
    o2 = str(tmp_path / "b2.bed")
    assert cli_main(["segment", "--betas", b, "-c", "2000", "-o", o1]) == 0
    assert cli_main(["segment", "--betas", b, "-c", "2000", "-o", o2,
                     "--procs", "2"]) == 0
    assert open(o1).read() == open(o2).read()
