"""pat -> beta conversion (the pileup pipeline).

Reference flow (ref: src/python/pat2beta.py:14-65): per-chromosome
`tabix | stdin2beta` processes in a Pool, concatenated with numpy and
saturated to uint8. Here the pat file streams through bounded-memory chunks
(formats/pat.py::iter_pat — BGZF slabs inflated by the multithreaded native
decompressor) and each chunk piles up on device; with more than one visible
device the count table lives sharded over the `sites` axis of a mesh —
on TPU meshes each shard runs the v3 row-packed Pallas kernel on
boundary-clipped fragments (parallel/sharded.py::ShardedPileupV3, 93.5%
of the single-chip flat-grid rate); the halo-ppermute scatter form
(ShardedPileup) remains for CPU meshes and A/B. Counts are integer adds,
so every path is bit-identical to the reference pileup.
"""

import os.path as op

import jax

from ..formats.pat import iter_pat
from ..ops.pileup import PileupAccumulator
from ..utils import splitextgz
from ..utils.log import logger

# one streamed slab of decompressed pat text (~32 MB ≈ 1M fragments); host
# peak memory stays O(chunk), not O(file)
DEF_CHUNK_BYTES = 32 << 20


def _accumulate_pat(pat_path, nr_sites, backend="auto", sharded=None,
                    chunk_bytes=DEF_CHUNK_BYTES):
    """Stream a pat file into a pileup accumulator. Returns
    (accumulator, nr_frags)."""
    window = (1, nr_sites + 1)
    if sharded is None:
        sharded = len(jax.devices()) > 1
    if sharded and len(jax.devices()) > 1:
        import os

        from ..parallel.mesh import make_mesh
        from ..parallel.sharded import ShardedPileup, ShardedPileupV3

        # WGBS_TPU_SHARDED_PILEUP: v3 (row-packed Pallas kernel per shard,
        # boundary-clipped — the single-chip headline kernel), halo (XLA
        # scatter + ppermute halo), auto (default: v3 on TPU where the
        # Mosaic kernel compiles natively; halo on CPU meshes, where
        # interpret-mode Pallas would be the slowest path in the room)
        mode = os.environ.get("WGBS_TPU_SHARDED_PILEUP", "auto")
        if mode == "v3" or (mode == "auto"
                            and jax.default_backend() == "tpu"):
            acc = ShardedPileupV3(make_mesh(), window)
        else:
            acc = ShardedPileup(make_mesh(), window)
    else:
        acc = PileupAccumulator(window, backend=backend)
    nf = 0
    it = iter_pat(pat_path, chunk_bytes=chunk_bytes)
    if getattr(acc, "device_total", True):
        # one-chunk lookahead: the next slab decompresses/parses (native
        # code, GIL released) while the current one stages and piles up on
        # device — add() is mostly device-queue wait, so the host is free
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(1) as ex:
            fut = ex.submit(next, it, None)
            while True:
                chunk = fut.result()
                if chunk is None:
                    break
                fut = ex.submit(next, it, None)
                acc.add(chunk)
                nf += chunk.nr_frags
        return acc, nf
    # host-total accumulators (native/xla-CPU) are CPU-bound end to end:
    # a lookahead thread only oversubscribes the cores (decode already uses
    # them all), so run the loop inline
    for chunk in it:
        acc.add(chunk)
        nf += chunk.nr_frags
    return acc, nf


def pat2beta(pat_path, out_dir=".", genome=None, lbeta=False, backend="auto",
             force=True, out_path=None, sharded=None,
             chunk_bytes=DEF_CHUNK_BYTES):
    """Convert a pat[.gz] file to a beta/lbeta file. Returns the output path."""
    from ..genome.refdir import Genome

    g = genome if genome is not None else Genome(None)
    nr_sites = g.get_nr_sites() if hasattr(g, "get_nr_sites") else g.nr_sites

    acc, nf = _accumulate_pat(pat_path, nr_sites, backend=backend,
                              sharded=sharded, chunk_bytes=chunk_bytes)

    suff = ".lbeta" if lbeta else ".beta"
    if out_path is None:
        out_path = op.join(out_dir, splitextgz(op.basename(pat_path))[0] + suff)
    acc.finalize(lbeta).tofile(out_path)
    logger.info("pat2beta: %s -> %s (%d frags, %d sites)", pat_path, out_path,
                nf, nr_sites)
    return out_path


def pat2beta_counts(pat_path, nr_sites, backend="auto", sharded=None):
    """Raw (nr_sites, 2) int counts (pre-saturation) for a pat file."""
    acc, _ = _accumulate_pat(pat_path, nr_sites, backend=backend,
                             sharded=sharded)
    return acc.result()
