"""docs/TUTORIAL.md is an executable spec: run every `bash tutorial` block.

Mirrors the role of the reference's tutorial/README.md (SURVEY.md §4): the
documented command sequence must keep working end-to-end.
"""

import os
import os.path as op
import re
import subprocess
import sys

import pytest

REPO = op.dirname(op.dirname(op.abspath(__file__)))
DOC = op.join(REPO, "docs", "TUTORIAL.md")


def tutorial_blocks():
    text = open(DOC).read()
    blocks = re.findall(r"```bash tutorial\n(.*?)```", text, flags=re.S)
    assert blocks, "no executable blocks found in TUTORIAL.md"
    return blocks


@pytest.mark.slow
def test_tutorial_runs_end_to_end(tmp_path):
    env = dict(
        os.environ,
        WGBS_TPU_REFDIR=str(tmp_path / "refs"),
        JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO,
    )
    script = "\n".join(["set -euo pipefail"] + tutorial_blocks())
    script = script.replace("REPO", REPO)
    script = script.replace("python ", sys.executable + " ", 1)
    script = script.replace("python -m", sys.executable + " -m")
    p = subprocess.run(["bash", "-c", script], cwd=tmp_path, env=env,
                       capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, (
        f"tutorial failed\nstdout:\n{p.stdout[-3000:]}\n"
        f"stderr:\n{p.stderr[-3000:]}")
    # spot-check artifacts the tutorial promises
    for f in ("demo.fa", "Pancreas.pat.gz", "Pancreas.beta", "blocks.bed",
              "fig.png", "merged.pat.gz", "Colon.counts.bam",
              "Pancreas.bigwig"):
        assert (tmp_path / f).exists(), f"missing tutorial artifact {f}"
