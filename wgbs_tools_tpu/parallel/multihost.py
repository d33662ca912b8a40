"""Multi-process (multi-host) execution path.

The reference's only multi-node awareness is reading
SLURM_JOB_CPUS_PER_NODE for its Pool size (ref: src/python/
utils_wgbs.py:250-261) — every run is one host. Here three whole-genome
jobs scale across N processes (one per host / pod-slice worker):

- **pat2beta**: processes join one `jax.distributed` job; each streams
  the pat rows overlapping its site range (".cdx"-indexed region read)
  into the v3 sharded pileup over its LOCAL devices, clipping fragments
  at its window edges. The pileup itself needs no cross-process
  collectives (round-5 redesign — the round-4 halo ppermute, per-round
  shape allgathers, and full-genome count allgather are gone); each
  process pwrites its own byte range of the beta. Per-process memory is
  O(shard).
- **segment**: the 60k-site chunk axis round-robins across processes
  (the distributed form of the reference's chunk Pool,
  ref: src/python/segment.py:137-155); process 0 stitches.
- **bam2pat**: contiguous chromosome blocks per worker (.bai-weighted),
  raw-BGZF part concat in chromosome order — host-bound, so workers are
  standalone processes (no device collectives to express).

On CPUs (tests / this sandbox) the same wiring runs with
`--xla_force_host_platform_device_count` virtual devices per process; on a
TPU pod each process binds its slice's chips and nothing else changes.
"""

import argparse
import os
import os.path as op
import socket
import subprocess
import sys

import numpy as np

from ..utils.log import logger


def distributed_init(coordinator, num_processes, process_id,
                     local_devices=None, platform=None):
    """Join (or create, for process 0) a jax.distributed job.

    Must run before any JAX backend initialization. local_devices forces
    that many virtual CPU devices per process (emulated multi-host);
    platform='cpu' routes around a pre-imported TPU platform the way
    tests/conftest.py does (config update still works while backends are
    uninitialized).
    """
    if local_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={local_devices}"
            ).strip()
    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax


def pat2beta_worker(pat_path, out_path, nr_sites, lbeta=False,
                    batch_frags=None):
    """Per-process body of the multi-process pat2beta.

    Every process must call this collectively (same arguments). Process 0
    creates the output file; every process writes its own byte range;
    process 0 returns the path, others return None.

    Design (round 5): the pileup needs NO cross-process collectives at
    all. Each process streams the pat rows OVERLAPPING its site range
    (the .cdx back-scan already pulls boundary-crossing fragments) and
    the sharded pileup CLIPS fragments at its window edges — the round-4
    halo `ppermute`, the 3 shape-agreement allgathers per 65k-fragment
    round, and the full-genome `process_allgather` of the count table
    (~226 MB to every process at hg19) are all gone. Per-process memory
    is O(shard); the only collectives are one tiny coverage allgather
    and two write barriers. Exactness: integer adds in a different
    grouping; boundary fragments contribute each site to exactly the one
    process owning it. Replaces the reference's single-host Pool + concat
    (ref: src/python/pat2beta.py:41-65).

    `batch_frags` is accepted for launcher compatibility and unused (the
    region iterator already streams in bounded chunks).

    Output assembly: the beta is a flat binary (site-major), so process p
    owns the contiguous byte range [(lo-1), (hi-1)) * 2 * itemsize and
    pwrites it directly — on one machine (emulated multi-host) or any
    shared filesystem this is exact and contention-free; a pod without a
    shared FS would write per-host shard files and concatenate.
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from ..formats.beta import trim_to_uint
    from ..formats.pat import iter_pat_region
    from .sharded import ShardedPileupV3

    pid = jax.process_index()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_dev = len(devs)
    n_pad = (nr_sites + n_dev - 1) // n_dev * n_dev
    S = n_pad // n_dev

    # this process's site range derives from its device POSITIONS in the
    # sorted process-major device list — `pid * k_local` silently diverges
    # from that ownership when per-process device counts are heterogeneous
    pos = [i for i, d in enumerate(devs) if d.process_index == pid]
    if pos != list(range(pos[0], pos[0] + len(pos))):
        raise RuntimeError(
            f"process {pid} devices are not contiguous in the sorted "
            f"device list ({pos}); per-process input ranges require "
            "process-major ordering")
    lo = min(pos[0] * S + 1, nr_sites + 1)   # 1-based, inclusive
    hi = min((pos[-1] + 1) * S + 1, nr_sites + 1)
    logger.info("multihost pat2beta: p%d streams sites [%d, %d)", pid, lo,
                hi)

    n_seen = 0
    if hi > lo:
        local = sorted(jax.local_devices(), key=lambda d: d.id)
        lmesh = Mesh(np.array(local), axis_names=("sites",))
        acc = ShardedPileupV3(lmesh, (lo, hi))
        for frags in iter_pat_region(pat_path, (lo, hi)):
            acc.add(frags)
            n_seen += frags.nr_frags
        counts = acc.result().astype(np.int64)
    else:
        counts = np.zeros((0, 2), dtype=np.int64)
    logger.info("multihost pat2beta: p%d streamed %d frags", pid, n_seen)

    # one tiny collective: exact int64 coverage total across processes
    covs = multihost_utils.process_allgather(
        np.asarray([int(counts[:, 1].sum())], dtype=np.int64))
    cov = int(np.sum(covs))

    itemsize = 2 if lbeta else 1
    if pid == 0:
        with open(out_path, "wb") as f:
            f.truncate(nr_sites * 2 * itemsize)
    multihost_utils.sync_global_devices("wgbs_beta_truncate")
    if hi > lo:
        beta_local = trim_to_uint(counts, lbeta)
        with open(out_path, "r+b") as f:
            f.seek((lo - 1) * 2 * itemsize)
            f.write(np.ascontiguousarray(beta_local).tobytes())
    multihost_utils.sync_global_devices("wgbs_beta_written")
    logger.info("multihost pat2beta: p%d total coverage %d", pid, cov)
    if pid != 0:
        return None
    return out_path


def segment_worker(beta_paths, ranges, out_prefix, max_cpg=1000,
                   max_bp=2000, pseudo_count=15.0, chunk_size=None,
                   min_cpg=1, mode="exact", genome=None):
    """Per-process body of the multi-process segmentation.

    The 60k-site chunk axis is round-robined across processes (the
    distributed form of the reference's process-per-chunk Pool,
    ref: src/python/segment.py:137-155); each process segments its chunks
    with its own local devices (fast mode) or host DP threads (exact
    mode), writes a part file, and process 0 stitches the overlap patches
    and returns the final blocks. Only barriers cross processes — the
    chunk results move through part files (matching the pat2beta
    assembly: the shared-FS write is the pod-scale seam).
    """
    import jax
    from jax.experimental import multihost_utils

    from ..genome.refdir import Genome
    from ..models.segment import (DEF_CHUNK, SegmentConfig, _seg_fn,
                                  break_to_chunks, finalize_segmentation,
                                  segment_chunks)

    pid = jax.process_index()
    nproc = jax.process_count()
    idx = Genome(genome).index
    cfg = SegmentConfig(max_cpg=max_cpg, max_bp=max_bp,
                        pseudo_count=pseudo_count,
                        chunk_size=chunk_size or DEF_CHUNK,
                        min_cpg=min_cpg, mode=mode)
    ranges = [(int(s), int(e)) for s, e in ranges]
    tags, chunks = break_to_chunks(ranges, cfg.chunk_size)
    own = list(range(pid, len(chunks), nproc))
    logger.info("multihost segment: p%d owns %d/%d chunks", pid, len(own),
                len(chunks))
    results = segment_chunks(beta_paths, chunks, idx, cfg, subset=own)
    np.savez(f"{out_prefix}.part{pid}.npz",
             idx=np.asarray(own, dtype=np.int64),
             **{f"r{i}": np.asarray(results[i], dtype=np.int64)
                for i in own})
    multihost_utils.sync_global_devices("wgbs_segment_parts")
    if pid != 0:
        return None
    results_all = [None] * len(chunks)
    for q in range(nproc):
        part = f"{out_prefix}.part{q}.npz"
        with np.load(part) as z:
            for i in z["idx"]:
                results_all[int(i)] = z[f"r{int(i)}"]
        if not os.environ.get("WGBS_TPU_DEBUG_KEEP_PARTS"):
            os.unlink(part)
    seg = _seg_fn(beta_paths, idx, cfg)
    starts, ends = finalize_segmentation(tags, chunks, results_all, seg, cfg)
    out = out_prefix + ".blocks.npz"
    np.savez(out, starts=starts, ends=ends)
    return out


def run_segment_multiprocess(beta_paths, ranges, out_prefix,
                             num_processes=2, local_devices=2,
                             platform="cpu", timeout=600, **cfg_kwargs):
    """Launcher: multi-process segmentation on this machine (emulated
    multi-host). Returns (starts, ends) loaded from process 0's output."""
    import json as _json
    import tempfile

    port = free_port()
    params = dict(beta_paths=list(beta_paths),
                  ranges=[[int(s), int(e)] for s, e in ranges],
                  out_prefix=out_prefix, **cfg_kwargs)
    fd, pfile = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as f:
        _json.dump(params, f)
    cmd_base = [
        sys.executable, "-m", "wgbs_tools_tpu.parallel.multihost",
        "--job", "segment", "--params", pfile,
        "--coordinator", f"localhost:{port}",
        "--num_processes", str(num_processes),
    ]
    if local_devices:
        cmd_base += ["--local_devices", str(local_devices)]
    if platform:
        cmd_base += ["--platform", platform]
    env = dict(os.environ)
    env["PYTHONPATH"] = op.dirname(op.dirname(op.dirname(
        op.abspath(__file__)))) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(cmd_base + ["--process_id", str(i)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(num_processes)]
    fail = None
    for i, pr in enumerate(procs):
        try:
            out, _ = pr.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
            fail = fail or f"worker {i} timed out"
        if pr.returncode != 0 and fail is None:
            fail = (f"worker {i} rc={pr.returncode}:\n"
                    + out.decode(errors="replace")[-2000:])
    os.unlink(pfile)
    if fail:
        raise RuntimeError(f"multi-process segment failed: {fail}")
    with np.load(out_prefix + ".blocks.npz") as z:
        return z["starts"].copy(), z["ends"].copy()


def _bam_ref_names(bam_path):
    """Reference names from a BAM header (lazy gzip read — only the header
    blocks are ever decompressed)."""
    import gzip
    import struct

    with gzip.open(bam_path, "rb") as f:
        if f.read(4) != b"BAM\x01":
            raise IOError(f"{bam_path}: not a BAM file")
        (l_text,) = struct.unpack("<i", f.read(4))
        f.read(l_text)
        (n_ref,) = struct.unpack("<i", f.read(4))
        names = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", f.read(4))
            names.append(f.read(l_name)[:-1].decode())
            f.read(4)  # l_ref
        return names


def _bam_chrom_weights(bam_path, chrom_names, idx):
    """Per-chromosome work estimate for partitioing bam2pat workers.

    With a .bai sidecar: compressed byte span of each reference's records
    (linear-index min .. chunk-end max — the same information `samtools
    view <chrom>` seeks by). Without one: the genome's per-chromosome CpG
    counts as a proxy.
    """
    import struct

    bai = bam_path + ".bai"
    if not op.isfile(bai):
        return {c: float(max(idx.chrom_nr_sites(c), 1))
                for c in chrom_names}
    try:
        with open(bai, "rb") as f:
            data = f.read()
        if data[:4] != b"BAI\x01":
            raise ValueError("bad magic")
        off = 4
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        spans = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, off)
            off += 4
            beg, end = None, 0
            for _ in range(n_bin):
                bin_id, n_chunk = struct.unpack_from("<Ii", data, off)
                off += 8
                for _ in range(n_chunk):
                    cbeg, cend = struct.unpack_from("<QQ", data, off)
                    off += 16
                    if bin_id == 37450:  # pseudo-bin: meta counts, not coords
                        continue
                    c0, c1 = cbeg >> 16, cend >> 16
                    beg = c0 if beg is None else min(beg, c0)
                    end = max(end, c1)
            (n_intv,) = struct.unpack_from("<i", data, off)
            off += 4 + 8 * n_intv
            spans.append(0.0 if beg is None else float(end - beg + 1))
        # map BAM ref order -> requested chromosome names via the header
        ref_names = _bam_ref_names(bam_path)
        w = {c: 1.0 for c in chrom_names}
        for name, sp in zip(ref_names, spans):
            if name in w:
                w[name] = max(sp, 1.0)
        return w
    except Exception as e:
        logger.info("bam2pat --procs: .bai parse failed (%s); using CpG "
                    "counts for balance", e)
        return {c: float(max(idx.chrom_nr_sites(c), 1))
                for c in chrom_names}


def _bai_ref_begs(bam_path):
    """Per-reference smallest chunk-begin VIRTUAL offset from the .bai
    (None for refs without alignments), in BAM header ref order — the
    seek targets for per-worker ranged decode. Returns None when no
    usable .bai exists."""
    import struct

    bai = bam_path + ".bai"
    if not op.isfile(bai):
        return None
    try:
        with open(bai, "rb") as f:
            data = f.read()
        if data[:4] != b"BAI\x01":
            return None
        off = 4
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        begs = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, off)
            off += 4
            beg = None
            for _ in range(n_bin):
                bin_id, n_chunk = struct.unpack_from("<Ii", data, off)
                off += 8
                for _ in range(n_chunk):
                    cbeg, _cend = struct.unpack_from("<QQ", data, off)
                    off += 16
                    if bin_id == 37450:  # pseudo-bin
                        continue
                    beg = cbeg if beg is None else min(beg, cbeg)
            (n_intv,) = struct.unpack_from("<i", data, off)
            off += 4 + 8 * n_intv
            begs.append(beg)
        return begs
    except Exception as e:
        logger.info("bam2pat --procs: .bai voffset parse failed (%s)", e)
        return None


def _partition_contiguous(names, weights, n_parts):
    """Split `names` (order preserved) into <= n_parts CONTIGUOUS groups
    with roughly equal total weight. Contiguity matters: per-part pat
    files concatenate in chromosome order, which IS global startCpG order
    (chromosome site ranges are disjoint and increasing)."""
    total = sum(weights[c] for c in names)
    parts, cur, acc = [], [], 0.0
    target = total / max(n_parts, 1)
    for c in names:
        cur.append(c)
        acc += weights[c]
        if acc >= target and len(parts) < n_parts - 1:
            parts.append(cur)
            cur, acc = [], 0.0
    if cur:
        parts.append(cur)
    return parts


def bam2pat_part_worker(bam, out_dir, chroms, genome=None, byte_range=None,
                        **kw):
    """Standalone worker: run bam2pat restricted to a CONTIGUOUS block of
    chromosomes; the part pat lands in out_dir. No jax.distributed — the
    bam2pat pipeline is host-bound (decode + calling) with no cross-part
    dependencies (mates pair within a chromosome, exactly as in the
    single-process pipeline and the reference's per-chromosome Pool,
    ref: src/python/bam2pat.py:303-356). byte_range: optional BAI
    virtual-offset pair — only that slice of the BAM is decompressed."""
    from ..genome.refdir import Genome
    from ..pipeline.bam2pat_run import bam2pat

    g = Genome(genome)
    if byte_range is not None:
        byte_range = (int(byte_range[0]),
                      None if byte_range[1] is None else int(byte_range[1]))
    _, pat_path, _ = bam2pat(bam, genome=g, out_dir=out_dir,
                             include_chroms=list(chroms),
                             byte_range=byte_range, **kw)
    return pat_path


def run_bam2pat_multiprocess(bam, out_dir=".", num_processes=2,
                             genome=None, timeout=1800, **kw):
    """Multi-process bam2pat: contiguous chromosome blocks (.bai-weighted
    when a BAI exists) across worker processes; parts concatenate by raw
    BGZF byte append (readers skip the embedded empty EOF blocks), then
    the .cdx/.csi index is rebuilt over the final file. The decompressed
    pat is byte-identical to the single-process output. Returns the pat
    path."""
    import json as _json
    import shutil
    import tempfile

    from ..genome.refdir import Genome
    from ..utils import pretty_name

    g = Genome(genome)
    idx = g.index
    ref_names = _bam_ref_names(bam)
    present = [c for c in idx.chrom_names if c in set(ref_names)]
    weights = _bam_chrom_weights(bam, present, idx)
    parts = _partition_contiguous(present, weights, num_processes)
    out_path = op.join(out_dir, pretty_name(bam) + ".pat.gz")

    # per-worker BYTE ranges from the .bai: each worker decompresses only
    # its chromosome block's records (plus the header) instead of the
    # whole BAM — decode then scales 1/N. Requires the BAM's on-disk ref
    # order (restricted to present chroms) to match genome order, which a
    # coordinate-sorted BAM against the same reference always satisfies;
    # otherwise workers fall back to whole-file decode + chrom filter
    # (identical output either way — the range is a pure IO optimization).
    begs = _bai_ref_begs(bam)
    ranges = [None] * len(parts)
    if begs is not None:
        beg_of = {n: begs[i] for i, n in enumerate(ref_names)
                  if i < len(begs)}
        order_ok = ([c for c in ref_names if c in set(present)] == present)
        if order_ok:
            starts = []
            for chroms in parts:
                vs = [beg_of.get(c) for c in chroms
                      if beg_of.get(c) is not None]
                starts.append(min(vs) if vs else None)
            for w in range(len(parts)):
                v0 = starts[w]
                if v0 is None:
                    continue
                v1 = None
                for w2 in range(w + 1, len(parts)):
                    if starts[w2] is not None:
                        v1 = starts[w2]
                        break
                ranges[w] = [int(v0), None if v1 is None else int(v1)]
        else:
            logger.info("bam2pat --procs: BAM ref order differs from the "
                        "genome's; using whole-file decode per worker")

    with tempfile.TemporaryDirectory() as td:
        procs = []
        part_paths = []
        env = dict(os.environ)
        env["PYTHONPATH"] = op.dirname(op.dirname(op.dirname(
            op.abspath(__file__)))) + os.pathsep + env.get("PYTHONPATH", "")
        for w, chroms in enumerate(parts):
            wdir = op.join(td, f"w{w}")
            os.makedirs(wdir)
            params = dict(bam=bam, out_dir=wdir, chroms=chroms,
                          genome=genome, byte_range=ranges[w], **kw)
            pfile = op.join(td, f"w{w}.json")
            with open(pfile, "w") as f:
                _json.dump(params, f)
            part_paths.append(op.join(wdir, pretty_name(bam) + ".pat.gz"))
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "wgbs_tools_tpu.parallel.multihost",
                 "--job", "bam2pat", "--params", pfile],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT))
        fail = None
        for w, pr in enumerate(procs):
            try:
                out, _ = pr.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                pr.kill()
                out, _ = pr.communicate()
                fail = fail or f"worker {w} timed out"
            if pr.returncode != 0 and fail is None:
                fail = (f"worker {w} rc={pr.returncode}:\n"
                        + out.decode(errors="replace")[-2000:])
        if fail:
            raise RuntimeError(f"multi-process bam2pat failed: {fail}")
        with open(out_path, "wb") as dst:
            for pp in part_paths:
                if op.isfile(pp):
                    with open(pp, "rb") as src:
                        shutil.copyfileobj(src, dst)
    from ..formats.pat import index_pat

    index_pat(out_path)
    return out_path


def _worker_main(argv=None):
    p = argparse.ArgumentParser(prog="wgbs-multihost-worker")
    p.add_argument("--coordinator")
    p.add_argument("--num_processes", type=int)
    p.add_argument("--process_id", type=int)
    p.add_argument("--local_devices", type=int, default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--job", default="pat2beta",
                   choices=["pat2beta", "segment", "bam2pat"])
    p.add_argument("--params", default=None,
                   help="JSON file of job kwargs (segment / bam2pat)")
    p.add_argument("--pat")
    p.add_argument("--out")
    p.add_argument("--nr_sites", type=int)
    p.add_argument("--lbeta", action="store_true")
    args = p.parse_args(argv)
    # validate before any backend/distributed initialization so usage
    # errors exit with argparse's code (2), not a traceback
    if args.job == "bam2pat":
        if not args.params:
            p.error("--params is required for the bam2pat job")
        # standalone host-pipeline worker: no jax.distributed (no device
        # collectives in the bam2pat path)
        import json as _json

        with open(args.params) as f:
            params = _json.load(f)
        bam2pat_part_worker(**params)
        return 0
    if not (args.coordinator and args.num_processes
            and args.process_id is not None):
        p.error("--coordinator/--num_processes/--process_id are required")
    if args.job == "segment" and not args.params:
        p.error("--params is required for the segment job")
    if args.job == "pat2beta" and not (args.pat and args.out
                                       and args.nr_sites):
        p.error("--pat/--out/--nr_sites are required for the pat2beta job")
    distributed_init(args.coordinator, args.num_processes, args.process_id,
                     local_devices=args.local_devices,
                     platform=args.platform)
    if args.job == "segment":
        import json as _json

        with open(args.params) as f:
            params = _json.load(f)
        segment_worker(**params)
        return 0
    pat2beta_worker(args.pat, args.out, args.nr_sites, lbeta=args.lbeta)
    return 0


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_pat2beta_multiprocess(pat_path, out_path, nr_sites,
                              num_processes=2, local_devices=2,
                              platform="cpu", lbeta=False, timeout=600):
    """Launcher: spawn num_processes workers on this machine (emulated
    multi-host — on a real pod each host starts its own worker with the
    shared coordinator address instead). Blocks until all workers exit;
    returns out_path."""
    port = free_port()
    cmd_base = [
        sys.executable, "-m", "wgbs_tools_tpu.parallel.multihost",
        "--coordinator", f"localhost:{port}",
        "--num_processes", str(num_processes),
        "--pat", pat_path, "--out", out_path,
        "--nr_sites", str(nr_sites),
    ]
    if local_devices:
        cmd_base += ["--local_devices", str(local_devices)]
    if platform:
        cmd_base += ["--platform", platform]
    if lbeta:
        cmd_base.append("--lbeta")
    env = dict(os.environ)
    env["PYTHONPATH"] = op.dirname(op.dirname(op.dirname(
        op.abspath(__file__)))) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(cmd_base + ["--process_id", str(i)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(num_processes)]
    fail = None
    for i, pr in enumerate(procs):
        try:
            out, _ = pr.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
            fail = fail or f"worker {i} timed out"
        if pr.returncode != 0 and fail is None:
            fail = (f"worker {i} rc={pr.returncode}:\n"
                    + out.decode(errors="replace")[-2000:])
    if fail:
        raise RuntimeError(f"multi-process pat2beta failed: {fail}")
    return out_path


if __name__ == "__main__":
    sys.exit(_worker_main())
