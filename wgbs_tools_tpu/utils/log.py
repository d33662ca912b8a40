"""Logging helpers.

The reference logs ad-hoc to stderr with per-tool prefixes
(ref: src/python/utils_wgbs.py:118-119). We keep that UX for the CLI but route
through the stdlib logger so library users can silence/redirect it.
"""

import logging
import sys
import time
from contextlib import contextmanager

logger = logging.getLogger("wgbs_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("[wt %(name)s] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def eprint(*args, **kwargs):
    print(*args, file=sys.stderr, **kwargs)


def set_verbose():
    """--verbose/--debug CLI flags: echo composed operations
    (ref: bam2pat.py:205-206 prints the shell commands when verbose)."""
    logger.setLevel(logging.DEBUG)


@contextmanager
def timed(label, out=None):
    """Wall-clock timer; appends (label, seconds) to `out` if given."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if out is not None:
        out.append((label, dt))
    else:
        logger.debug("%s: %.3fs", label, dt)
