#!/usr/bin/env python
"""Headline benchmark: pat2beta pileup fragments/s/chip.

Measures the steady-state Pallas pileup kernel rate on device-resident
fragment batches (the production layout: fragments are decoded once into
bit-packed device arrays, then piled up), and compares against the
reference's `stdin2beta` C++ stream kernel (compiled from /root/reference at
run time) processing the same fragments as pat text on one CPU core — the
reference's actual execution model (ref: src/python/pat2beta.py:41-65).

Methodology (round 4): the round-3 headline was not reproducible across
processes (510 vs 202 M frags/s on consecutive days) because a single
process measured one K=8 burst, which is still sensitive to tunnel latency
drift. Now:
  * CROSS-PROCESS: the parent spawns BENCH_PROCS (default 3) fresh child
    processes; the headline is the median of per-process rates and the
    cross-process range is reported (`process_rates`, `cross_process_
    spread_pct`). Two consecutive bench.py runs should agree within that
    spread.
  * BURST CURVE: each child times bursts of K = 8, 64, 256 back-to-back
    dispatches with one trailing sync. time/K = t_kernel + c/K separates
    the kernel rate (large K asymptote) from per-burst tunnel overhead;
    the curve is printed so latency-dominated runs are self-diagnosing.

Prints ONE JSON line:
  {"metric": "pat2beta_frags_per_s_chip", "value": N, "unit": "frags/s",
   "vs_baseline": N, ...}
"""

import json
import os
import os.path as op
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, op.dirname(op.abspath(__file__)))

import numpy as np

# persistent compile cache (a no-op if the PJRT backend can't serialize
# executables; saves the multi-minute remote compile when it can)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    op.join(op.dirname(op.abspath(__file__)), ".jax_cache"),
)

N_FRAGS = int(os.environ.get("BENCH_FRAGS", 2_000_000))
N_SITES = int(os.environ.get("BENCH_SITES", 4_000_000))
MAX_LEN = 24
# v3 = row-packed kernel (fastest); v2 = sub-block grouped
KERNEL = os.environ.get("BENCH_KERNEL", "v3")
REFERENCE = os.environ.get("WGBS_REFERENCE", "/root/reference")
BURSTS = [int(k) for k in os.environ.get("BENCH_BURSTS", "8,64,256").split(",")]
TRIALS = int(os.environ.get("BENCH_TRIALS", 3))  # per burst size
PROCS = int(os.environ.get("BENCH_PROCS", 3))


def make_frags(rng, n_frags, n_sites, max_len):
    from tests.synth import random_frags

    return random_frags(rng, n_frags, n_sites - max_len - 1, max_len=max_len,
                        max_count=3, dot_rate=0.03, h_rate=0.01)


def bench_reference(frags, n_sites):
    """Wall time of the reference stdin2beta on the same fragments (1 core)."""
    src = op.join(REFERENCE, "src/pat2beta/stdin2beta.cpp")
    if not op.isfile(src):
        return None
    from wgbs_tools_tpu.formats.pat import frags_to_bytes

    with tempfile.TemporaryDirectory() as td:
        exe = op.join(td, "stdin2beta")
        try:
            subprocess.check_call(
                ["g++", "-std=c++11", "-O2", "-o", exe, src],
                stderr=subprocess.DEVNULL,
            )
        except Exception:
            return None
        pat_text = frags_to_bytes(frags)
        pat_file = op.join(td, "in.pat")
        with open(pat_file, "wb") as f:
            f.write(pat_text)
        t0 = time.perf_counter()
        with open(pat_file, "rb") as f:
            subprocess.run(
                [exe, "1", str(n_sites + 1)],
                stdin=f,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
                check=True,
            )
        return time.perf_counter() - t0


def _device_runner(frags, n_sites):
    """Stage the fragments and return a zero-arg dispatch closure + sync."""
    import jax
    import jax.numpy as jnp

    interpret = jax.default_backend() != "tpu"
    grid = os.environ.get("WGBS_TPU_PILEUP_V3_GRID", "flat")
    staged = None
    if KERNEL == "v3":
        from wgbs_tools_tpu.ops import pileup_tpu3 as p3

        # lane/vals staging has flat-grid kernels only; the tiled A/B grid
        # stages classic (mirrors pileup_pallas_v3's gate). Geometry and
        # classes resolve inside stage_v3 by the active form.
        staged = p3.stage_v3(frags.start, frags.length, frags.count,
                             frags.codes, 1, n_sites,
                             lane_counts=(False if grid == "tiled"
                                          else None))
    if staged is not None and isinstance(staged, list):
        # row-count-class dispatch (WGBS_TPU_V3_CLASSES): stage device args
        # per class, dispatch all grids per run, sum on device. 10-field
        # tuples are the value-plane form (WGBS_TPU_V3_VALS=1), 9-field
        # the lane-count form (WGBS_TPU_V3_LANE_COUNTS=1).
        runs = []
        for st in staged:
            if len(st) == 10:  # value-plane form (WGBS_TPU_V3_VALS=1)
                c0, c1, meta, mvp, cvp, mc, tile, rc, g_max, _tag = st
                a, b, kind = (jnp.asarray(mvp), None if cvp is None
                              else jnp.asarray(cvp), "vals")
            elif len(st) == 9:  # lane-count form
                c0, c1, meta, words, cnts, mc, tile, rc, g_max = st
                a, b, kind = jnp.asarray(words), jnp.asarray(cnts), "lc"
            else:
                c0, c1, meta, words, mc, tile, rc, g_max = st
                a, b, kind = jnp.asarray(words), None, "classic"
            ctile, covered = p3._flat_args(c0, c1, meta.shape[0])
            runs.append((kind, jnp.asarray(ctile), jnp.asarray(covered),
                         jnp.asarray(meta), a, b, tile, rc, g_max))

        def run():
            meth = cov = None
            for kind, ct, cv, me, a, b, tile, rc, g_max in runs:
                if kind == "vals":
                    m, c = p3._call_flat_vals(ct, cv, me, a, b, n_sites,
                                              tile, rc, g_max, interpret)
                elif kind == "lc":
                    m, c = p3._call_flat_lc(ct, cv, me, a, b, n_sites,
                                            tile, rc, g_max, interpret,
                                            p3._lc_fast_dot())
                else:
                    m, c = p3._call_flat(ct, cv, me, a, n_sites, tile, rc,
                                         g_max, interpret)
                meth = m if meth is None else meth + m
                cov = c if cov is None else cov + c
            return meth, cov
    elif staged is not None:
        if grid == "tiled":
            c0, c1, meta, words, mc, tile, rc, g_max = staged
            dev = (jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(meta),
                   jnp.asarray(words))

            def run():
                return p3._call(*dev, n_sites, tile, rc, g_max, mc, interpret)
        elif len(staged) == 10:  # value-plane form
            c0, c1, meta, mvp, cvp, mc, tile, rc, g_max, _tag = staged
            ctile, covered = p3._flat_args(c0, c1, meta.shape[0])
            dev = (jnp.asarray(ctile), jnp.asarray(covered),
                   jnp.asarray(meta), jnp.asarray(mvp),
                   None if cvp is None else jnp.asarray(cvp))

            def run():
                return p3._call_flat_vals(*dev, n_sites, tile, rc, g_max,
                                          interpret)
        elif len(staged) == 9:  # lane-count form
            c0, c1, meta, words, cnts, mc, tile, rc, g_max = staged
            ctile, covered = p3._flat_args(c0, c1, meta.shape[0])
            dev = (jnp.asarray(ctile), jnp.asarray(covered),
                   jnp.asarray(meta), jnp.asarray(words), jnp.asarray(cnts))

            def run():
                return p3._call_flat_lc(*dev, n_sites, tile, rc, g_max,
                                        interpret, p3._lc_fast_dot())
        else:
            c0, c1, meta, words, mc, tile, rc, g_max = staged
            ctile, covered = p3._flat_args(c0, c1, meta.shape[0])
            dev = (jnp.asarray(ctile), jnp.asarray(covered),
                   jnp.asarray(meta), jnp.asarray(words))

            def run():
                return p3._call_flat(*dev, n_sites, tile, rc, g_max,
                                     interpret)
    else:  # native packer unavailable: v2 does the same job
        from wgbs_tools_tpu.ops import pileup_tpu2 as p2

        c0, c1, meta, words, mc = p2.stage_v2(
            frags.start, frags.length, frags.count, frags.codes, 1, n_sites)
        dev = (jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(meta),
               jnp.asarray(words))

        def run():
            return p2._call(*dev, n_sites, p2.SB * p2.TILE_SB, p2.FRAG_CHUNK,
                            p2.G_MAX, mc, interpret)

    def sync(o):
        # On the axon-tunneled TPU, block_until_ready does not reliably
        # wait; a 1-element fetch forces completion.
        np.asarray(o[0][:1])

    return run, sync


def _sharded_runner(frags, n_sites):
    """Dispatch closure for the ShardedPileupV3 path (v3 Pallas kernel per
    mesh shard, manual per-device dispatch — parallel/sharded.py). On the
    single available chip this is a 1-device mesh; the burst excludes host
    staging exactly like the flat-grid headline, so the two rates are
    directly comparable (the delta is the sharded path's per-launch
    accumulate into the device-resident total)."""
    import jax
    import jax.numpy as jnp

    from wgbs_tools_tpu.ops import pileup_tpu3 as p3
    from wgbs_tools_tpu.parallel.mesh import make_mesh
    from wgbs_tools_tpu.parallel.sharded import ShardedPileupV3, _shard_add

    interpret = jax.default_backend() != "tpu"
    mesh = make_mesh(samples_axis=1)
    acc = ShardedPileupV3(mesh, (1, n_sites + 1))
    per_dev = []
    for i, dev in enumerate(acc.devices):
        lo = 1 + i * acc.S
        hi = min(lo + acc.S, n_sites + 1)
        sel = frags.slice_sites(lo, hi, min_overlap=1)
        if sel.nr_frags == 0:
            continue
        staged = p3.stage_v3(sel.start, sel.length, sel.count, sel.codes,
                             lo, acc.S)
        runs = []
        with jax.default_device(dev):
            for st in (staged if isinstance(staged, list) else [staged]):
                if len(st) == 10:  # value-plane form
                    c0, c1, meta, mvp, cvp, mc, tile, rc, g_max, _tag = st
                    a, b, kind = (jnp.asarray(mvp), None if cvp is None
                              else jnp.asarray(cvp), "vals")
                elif len(st) == 9:  # lane-count form
                    c0, c1, meta, words, cnts, mc, tile, rc, g_max = st
                    a, b, kind = (jnp.asarray(words), jnp.asarray(cnts),
                                  "lc")
                else:
                    c0, c1, meta, words, mc, tile, rc, g_max = st
                    a, b, kind = jnp.asarray(words), None, "classic"
                ctile, covered = p3._flat_args(c0, c1, meta.shape[0])
                runs.append((kind, jnp.asarray(ctile), jnp.asarray(covered),
                             jnp.asarray(meta), a, b, tile, rc, g_max))
        per_dev.append((i, dev, runs))

    def run():
        out = None
        for i, dev, runs in per_dev:
            with jax.default_device(dev):
                meth = cov = None
                for kind, ct, cv, me, a, b, tile, rc, g_max in runs:
                    if kind == "vals":
                        # fused single-dispatch pileup+accumulate (the
                        # production ShardedPileupV3._fused_add path)
                        acc.totals[i] = p3.pileup_vals_add(
                            acc.totals[i], ct, cv, me, a, b, acc.S,
                            tile, rc, g_max, interpret)
                        continue
                    if kind == "lc":
                        m, c = p3._call_flat_lc(ct, cv, me, a, b, acc.S,
                                                tile, rc, g_max, interpret,
                                                p3._lc_fast_dot())
                    else:
                        m, c = p3._call_flat(ct, cv, me, a, acc.S, tile,
                                             rc, g_max, interpret)
                    meth = m if meth is None else meth + m
                    cov = c if cov is None else cov + c
                if meth is not None:
                    acc.totals[i] = _shard_add(
                        acc.totals[i], jnp.stack([meth, cov], axis=1))
                out = acc.totals[i]
        return (out,)

    def sync(o):
        np.asarray(o[0][:1])

    return run, sync


def _measure_child(frags):
    """One process's burst-curve measurement: {K: [dt_per_launch, ...]}."""
    if os.environ.get("BENCH_MODE") == "sharded":
        run, sync = _sharded_runner(frags, N_SITES)
    else:
        run, sync = _device_runner(frags, N_SITES)
    sync(run())  # compile + warm
    curve = {}
    for K in BURSTS:
        dts = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            out = None
            for _ in range(K):
                out = run()
            sync(out)
            dts.append((time.perf_counter() - t0) / K)
        curve[K] = dts
    return curve


def _spawn_children(n_procs):
    """Run n_procs fresh child processes; returns their curve dicts."""
    budget = int(os.environ.get("BENCH_TIMEOUT", 900))  # per child
    env = dict(os.environ, BENCH_CHILD="1")
    curves = []
    for i in range(n_procs):
        try:
            p = subprocess.run(
                [sys.executable, op.abspath(__file__)],
                env=env, timeout=budget, stdout=subprocess.PIPE,
            )
        except subprocess.TimeoutExpired:
            print(f"[bench] child {i} exceeded {budget}s (wedged TPU "
                  "tunnel?); skipping", file=sys.stderr)
            continue
        if p.returncode != 0:
            print(f"[bench] child {i} failed rc={p.returncode}",
                  file=sys.stderr)
            continue
        try:
            curves.append(json.loads(p.stdout.decode().strip().splitlines()[-1]))
        except Exception:
            print(f"[bench] child {i} output unparseable", file=sys.stderr)
    if not curves:
        print("[bench] no child process succeeded", file=sys.stderr)
        sys.exit(1)
    return curves


def main():
    rng = np.random.default_rng(20260817)
    frags = make_frags(rng, N_FRAGS, N_SITES, MAX_LEN)
    F = frags.nr_frags

    if os.environ.get("BENCH_CHILD"):
        curve = _measure_child(frags)
        print(json.dumps({str(k): v for k, v in curve.items()}))
        return

    curves = _spawn_children(PROCS)

    # per-process kernel rate = median trial at the largest burst size (the
    # K -> inf asymptote; per-burst tunnel overhead is amortized away)
    kmax = str(max(BURSTS))
    proc_rates = []
    for c in curves:
        dts = sorted(c[kmax])
        proc_rates.append(F / dts[len(dts) // 2])
    proc_rates.sort()
    tpu_rate = proc_rates[len(proc_rates) // 2]
    cross_spread = (100 * (proc_rates[-1] - proc_rates[0]) / tpu_rate
                    if len(proc_rates) > 1 else 0.0)

    # burst curve (median across processes and trials, per K): rising rate
    # with K == the small-K numbers were latency-bound, not kernel-bound
    burst_curve = {}
    for K in BURSTS:
        all_dts = sorted(d for c in curves for d in c[str(K)])
        burst_curve[str(K)] = round(F / all_dts[len(all_dts) // 2], 1)

    # sharded-path rate (ShardedPileupV3 on a 1-device mesh): one extra
    # child; must land within ~10% of the flat-grid headline (the v3
    # kernel now carries the multi-device path too)
    sharded_rate = None
    try:
        env = dict(os.environ, BENCH_CHILD="1", BENCH_MODE="sharded")
        p = subprocess.run([sys.executable, op.abspath(__file__)], env=env,
                           timeout=int(os.environ.get("BENCH_TIMEOUT", 900)),
                           stdout=subprocess.PIPE)
        if p.returncode == 0:
            c = json.loads(p.stdout.decode().strip().splitlines()[-1])
            dts = sorted(c[kmax])
            sharded_rate = F / dts[len(dts) // 2]
    except Exception as e:
        print(f"[bench] sharded child failed: {e}", file=sys.stderr)

    # the reference baseline is re-measured per run and is the noisier
    # quantity (CPU contention); median of its own trials
    ref_dts = [bench_reference(frags, N_SITES) for _ in range(3)]
    ref_dts = sorted(d for d in ref_dts if d)
    ref_rate = F / ref_dts[len(ref_dts) // 2] if ref_dts else None
    vs_baseline = tpu_rate / ref_rate if ref_rate else None

    print(
        json.dumps(
            {
                "metric": "pat2beta_frags_per_s_chip",
                "value": round(tpu_rate, 1),
                "unit": "frags/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "processes": len(proc_rates),
                "process_rates": [round(r, 1) for r in proc_rates],
                "cross_process_spread_pct": round(cross_spread, 1),
                "burst_curve_frags_per_s": burst_curve,
                "sharded_v3_frags_per_s": round(sharded_rate, 1)
                if sharded_rate else None,
                "sharded_vs_flat_pct": round(100 * sharded_rate / tpu_rate,
                                             1) if sharded_rate else None,
                "baseline_frags_per_s": round(ref_rate, 1)
                if ref_rate else None,
            }
        )
    )


if __name__ == "__main__":
    main()
