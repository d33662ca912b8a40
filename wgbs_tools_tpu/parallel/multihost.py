"""Multi-process (multi-host) execution path.

The reference's only multi-node awareness is reading
SLURM_JOB_CPUS_PER_NODE for its Pool size (ref: src/python/
utils_wgbs.py:250-261) — every run is one host. Here the TPU-native
equivalent is real: N processes (one per host / pod-slice worker) join one
`jax.distributed` job, their local devices form a single global mesh, and
the same shard_map pileup step that runs single-process executes SPMD
across processes — the halo `ppermute` and coverage `psum` become
cross-process collectives over ICI/DCN with no code change to the kernel
(parallel/sharded.py::build_pileup_accum_step).

Input sharding is per-process by genomic range: process p reads ONLY the
pat rows whose startCpG falls in its shards' site rows (the ".cdx"-indexed
region read), so no host ever touches the whole file — the "16 hosts shard
the pat by chromosome ranges" layout of BENCHMARKS.md's v5p-16 projection.
Fragments crossing a shard boundary are completed by the halo exchange,
exactly as in the single-process mesh path, so the assembled beta is
byte-identical to the single-device pileup.

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


def global_sites_mesh():
    """1-D `sites` mesh over every device of the distributed job, ordered
    process-major so shard ownership is contiguous per process."""
    import jax
    from jax.sharding import Mesh

    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), axis_names=("sites",))


def _allgather_max(value):
    """Max of a host int across processes (shape agreement for jit calls)."""
    from jax.experimental import multihost_utils

    return int(np.max(multihost_utils.process_allgather(
        np.asarray([value], dtype=np.int64))))


def pat2beta_worker(pat_path, out_path, nr_sites, lbeta=False,
                    batch_frags=1 << 16):
    """Per-process body of the multi-process pat2beta.

    Every process must call this collectively (same arguments). Process 0
    writes the beta and returns its path; others return None.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..formats.beta import save_beta, trim_to_uint
    from ..formats.pat import read_pat
    from .sharded import bucket_fragments, build_pileup_accum_step

    from ..formats.pat import iter_pat_region

    mesh = global_sites_mesh()
    n_dev = mesh.devices.size
    pid = jax.process_index()
    k_local = len(jax.local_devices())
    n_pad = (nr_sites + n_dev - 1) // n_dev * n_dev
    S = n_pad // n_dev

    # per-process input sharding: this process's site rows, STREAMED in
    # bounded memory (a 30x pat range is still GBs materialized; the
    # region iterator seeks via the .cdx and reads chunk by chunk).
    # The range derives from this process's device POSITIONS in the sorted
    # process-major mesh — `pid * k_local` silently diverges from mesh
    # ownership when per-process device counts are heterogeneous.
    pos = [i for i, d in enumerate(mesh.devices.ravel())
           if d.process_index == pid]
    if pos != list(range(pos[0], pos[0] + len(pos))):
        raise RuntimeError(
            f"process {pid} devices are not contiguous in the sorted mesh "
            f"({pos}); per-process input ranges require process-major "
            "device ordering")
    lo = pos[0] * S + 1                 # 1-based, inclusive
    hi = min((pos[-1] + 1) * S + 1, nr_sites + 1)
    it = iter_pat_region(pat_path, (lo, hi)) if hi > lo else iter(())
    logger.info("multihost pat2beta: p%d streams sites [%d, %d)", pid, lo,
                hi)

    halo = 0  # grows (collectively) when a longer fragment arrives
    step = None
    sh2 = NamedSharding(mesh, P("sites", None))
    sh1 = NamedSharding(mesh, P("sites"))
    total = jax.make_array_from_process_local_data(
        sh2, np.zeros((k_local * S, 2), dtype=np.int32), (n_pad, 2))

    pend = None
    n_seen = 0

    def next_batch():
        """Next <= batch_frags fragments STARTING in [lo, hi), or None."""
        nonlocal pend
        parts = []
        got = 0
        while got < batch_frags:
            if pend is None:
                nxt = next(it, None)
                if nxt is None:
                    break
                keep = (nxt.start >= lo) & (nxt.start < hi)
                pend = nxt.take(np.asarray(keep))
                if pend.nr_frags == 0:
                    pend = None
                    continue
            take = min(batch_frags - got, pend.nr_frags)
            parts.append(pend.take(slice(0, take)))
            pend = pend.take(slice(take, pend.nr_frags)) \
                if take < pend.nr_frags else None
            got += take
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        from ..cli.cmd_pat import _concat_frags

        return _concat_frags(parts)

    # dynamic collective rounds: each round every process reports whether
    # it still has input (allgather), and all run one identically-shaped
    # step — processes that ran dry contribute empty buckets
    while True:
        batch = next_batch()
        has = 0 if batch is None else batch.nr_frags
        if _allgather_max(has) == 0:
            break
        n_seen += has
        if batch is None:
            start = np.zeros(0, np.int64)
            ln_ = cn_ = np.zeros(0, np.int32)
            cd_ = np.zeros((0, 1), np.uint8)
        else:
            start, ln_, cn_, cd_ = (batch.start, batch.length, batch.count,
                                    batch.codes)
        hmax = _allgather_max(int(ln_.max()) if has else 1)
        h = 16
        while h < hmax:
            h <<= 1
        if h > S:
            raise ValueError(f"fragment length {hmax} exceeds a site "
                             f"shard ({S})")
        if step is None or h > halo:
            halo = h
            step = build_pileup_accum_step(mesh, n_pad, halo)
        L = _allgather_max(cd_.shape[1] if has else 1)
        L = (L + 31) // 32 * 32
        rs, ln, cn, cd = bucket_fragments(
            start, ln_, cn_, cd_, k_local * S, k_local,
            max_len=L, base=lo, fp_mult=1)
        cap = _allgather_max(rs.shape[0] // k_local)
        cap = 1 << max(int(cap - 1).bit_length(), 6)  # pow2: few jit shapes
        per = rs.shape[0] // k_local

        def pad(a, fill=0):
            a = a.reshape(k_local, per, *a.shape[1:])
            want = [(0, 0), (0, cap - per)] + [(0, 0)] * (a.ndim - 2)
            return np.pad(a, want, constant_values=fill).reshape(
                k_local * cap, *a.shape[2:])

        ga = [jax.make_array_from_process_local_data(
                  sh2 if a.ndim > 1 else sh1, np.ascontiguousarray(x),
                  (n_dev * cap,) + a.shape[1:])
              for a, x in ((rs, pad(rs)), (ln, pad(ln)), (cn, pad(cn)),
                           (cd, pad(cd, 3)))]
        total = step(total, *ga)
    logger.info("multihost pat2beta: p%d streamed %d frags", pid, n_seen)

    # cross-process reduction checks + assembly: overflow-safe coverage
    # all-reduce (the _psum64 pair, replicated to every process) and a full
    # all-gather for the beta write on process 0
    from .sharded import decode_sum64

    pair = jax.jit(
        lambda t: (jnp.sum(t[:, 1], dtype=jnp.int32),
                   jnp.sum(t[:, 1].astype(jnp.float32))),
        out_shardings=NamedSharding(mesh, P()))(total)
    cov = decode_sum64(np.asarray(pair[0]), np.asarray(pair[1]))
    counts = multihost_utils.process_allgather(total, tiled=True)[:nr_sites]
    logger.info("multihost pat2beta: p%d total coverage %d", pid, cov)
    if pid != 0:
        return None
    save_beta(out_path, trim_to_uint(counts, lbeta))
    return out_path


def _worker_main(argv=None):
    p = argparse.ArgumentParser(prog="wgbs-multihost-worker")
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--local_devices", type=int, default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--pat", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--nr_sites", type=int, required=True)
    p.add_argument("--lbeta", action="store_true")
    args = p.parse_args(argv)
    distributed_init(args.coordinator, args.num_processes, args.process_id,
                     local_devices=args.local_devices,
                     platform=args.platform)
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
