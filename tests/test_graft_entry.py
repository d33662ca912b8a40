"""Driver entry-point contract tests (CPU, virtual devices)."""

import numpy as np
import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    merged, tb, total_cov = out
    assert merged.shape[1] == 2
    assert tb.shape[0] == merged.shape[0]
    assert int(np.asarray(total_cov)) > 0


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
