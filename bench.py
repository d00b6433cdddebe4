"""Flagship benchmark: 127-qubit heavy-hex kicked-Ising Trotter evolution.

Metric (per `BASELINE.json`): gate-layers/sec at bond dimension chi=64 on the
127-qubit IBM Eagle heavy-hex lattice (`tnqs.eagle_lattice()` — 127 vertices /
144 edges, the device geometry of the kicked-Ising utility experiment the
reference simulates: `/root/reference/examples/heavyhexIsing_dynamics.jl`,
Tindall et al., PRX Quantum 5, 010308 (2024)).  One "layer" is the full kicked
Ising Trotter step: 127 Rx gates + one Rzz per lattice edge (144 edges, three
edge-color groups) with simple update against BP bond environments, including
all interleaved BP refreshes to tolerance.

The compiled engine (`tnqs.engine.LatticeEngine`) executes the layer as one
XLA program on the default JAX device (TPU when present).  `vs_baseline` is
the speedup over the reference's execution model — per-gate, dynamically
shaped simple update with sequential BP sweeps (our flex tier, which mirrors
`src/Apply/apply_gates.jl` + `src/MessagePassing/*` structurally) — measured
on the same host.  The reference publishes no numbers of its own
(`BASELINE.json "published": {}`), so the architectural baseline is the
honest comparison available without Julia.

Output contract (driver parses a JSON line from the output tail): the
headline JSON line

  {"metric": ..., "value": N, "unit": "layers/sec", "vs_baseline": N}

is printed (flushed) IMMEDIATELY after the flagship evolve stage, so a
driver timeout during the optional stages still captures the headline
(round 3's `BENCH_r03.json` was rc=124/void because the old layout printed
only after every stage).  If any optional stage ran, the same line is
re-printed at exit enriched with the optional-stage keys and a per-stage
`stages: {...}` wall-clock map (verdict r3 item 9) — the headline keys are
identical in both lines, so first-line and last-line parsers agree.

Every optional stage runs under a total wall-clock budget
(`TNQS_BENCH_BUDGET` seconds from process start, default 2400); a stage
whose estimated cost exceeds the remaining budget is skipped with a
stderr note instead of silently outliving the driver.

Env knobs: TNQS_BENCH_FAST=1 (tiny smoke config), TNQS_BENCH_STEPS=n,
TNQS_BENCH_BUDGET=secs (total wall-clock bound, 0 disables),
TNQS_BENCH_SKIP_FASTMODE=1 (skip the subspace fast-mode throughput stage),
TNQS_BENCH_FORCE_FLEX=1 (re-measure the host flex baseline instead of using
the cached `.bench_flex_baseline.json`), TNQS_PROFILE=<dir> (xprof trace of
the timed loop, viewable in TensorBoard/Perfetto).
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

FAST = bool(os.environ.get("TNQS_BENCH_FAST"))
CACHE = pathlib.Path(__file__).resolve().parent / ".bench_flex_baseline.json"
LOCK = pathlib.Path("/tmp/tnqs_tpu.lock")

T0 = time.time()
BUDGET = float(os.environ.get("TNQS_BENCH_BUDGET", "2400"))


def remaining_budget() -> float:
    """Seconds left in the total wall-clock budget (inf when disabled)."""
    if BUDGET <= 0:
        return float("inf")
    return BUDGET - (time.time() - T0)


def _lock_owner_alive():
    """True/False if the recorded holder pid is alive/dead, None if no owner
    is recorded (pre-owner-write window, or a foreign lock)."""
    try:
        pid = int((LOCK / "owner").read_text())
    except (OSError, ValueError):
        return None
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def _release_tpu_lock():
    import shutil

    try:
        if (LOCK / "owner").read_text().strip() != str(os.getpid()):
            return  # the lock was stolen and re-acquired; not ours to remove
    except OSError:
        return
    shutil.rmtree(LOCK, ignore_errors=True)


def acquire_tpu_lock(max_wait_s: float = 7200.0, stale_s: float = 10800.0):
    """Serialize TPU access across processes (mkdir-based lock, shared with
    `scripts/tpu_queue*.sh`): two concurrent axon processes wedge the single
    tunneled chip (CLAUDE.md).  No-op when running CPU-only.

    The lock dir records its holder's pid in ``owner``; a lock whose holder
    is dead (or, with no owner recorded, older than `stale_s`) is stolen by
    atomically renaming the dir aside (rename picks exactly one winner, so
    two stealers can never both proceed) and removing it.  Release verifies
    ownership first, so a holder that was stolen from never deletes the
    thief's lock.  SIGTERM (e.g. coreutils `timeout`) exits via SystemExit
    so the atexit release still runs."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS", ""):
        return
    import shutil

    t0 = time.time()
    warned = False
    while True:
        try:
            LOCK.mkdir()
            break
        except FileExistsError:
            alive = _lock_owner_alive()
            if alive is None:
                try:
                    stale = time.time() - LOCK.stat().st_mtime > stale_s
                except OSError:
                    continue  # raced with the holder's release
            else:
                stale = not alive
            if stale:
                grave = LOCK.with_name(f"{LOCK.name}.stale.{os.getpid()}")
                try:
                    os.rename(LOCK, grave)
                except OSError:
                    continue  # another stealer won, or the holder released
                shutil.rmtree(grave, ignore_errors=True)
                continue
            if not warned:
                print(
                    "# waiting for the TPU lock (another tnqs TPU process "
                    "is active; see /tmp/tnqs_tpu.lock)",
                    file=sys.stderr,
                )
                warned = True
            if time.time() - t0 > max_wait_s:
                raise RuntimeError(
                    "timed out waiting for the TPU lock; remove "
                    f"{LOCK} if its holder crashed"
                )
            time.sleep(30)
    (LOCK / "owner").write_text(str(os.getpid()))
    import atexit
    import signal

    atexit.register(_release_tpu_lock)
    try:
        signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))
    except ValueError:
        pass  # not the main thread; atexit alone will have to do


def wait_for_tpu(max_wait_s: float | None = None):
    """Block until the tunneled TPU answers a trivial computation (subprocess
    probe, so a wedged/offline chip can be timed out and retried).  The chip
    has multi-hour outages (`docs/performance.md`); without this, a bench
    launched mid-outage fails instantly instead of producing a result.
    No-op in CPU mode.  `TNQS_BENCH_TPU_WAIT` (seconds, 0 disables) overrides
    the default 3600 s budget."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS", ""):
        return
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("TNQS_BENCH_TPU_WAIT", "3600"))
        # never let the wait eat the whole budget: the flagship evolve needs
        # ~900 s worst-case (cold remote compile) after the chip answers
        rem = remaining_budget()
        if rem != float("inf"):
            max_wait_s = max(0.0, min(max_wait_s, rem - 900.0))
    if max_wait_s <= 0:
        return
    import subprocess

    probe_src = (
        "import jax, jax.numpy as jnp\n"
        "d = [x for x in jax.devices() if x.platform != 'cpu']\n"
        "assert d, 'no TPU device'\n"
        "v = float(jax.device_get(jnp.ones((8, 8), jnp.float32).sum()))\n"
        "assert v == 64.0, v\n"
    )
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        # the probe itself can hang on a dead tunnel; bound it hard with
        # coreutils timeout (SIGKILL-capable, unlike subprocess timeout=
        # which only works once the child is signal-responsive)
        r = subprocess.run(
            ["timeout", "-k", "10", "150", sys.executable, "-c", probe_src],
            capture_output=True,
        )
        if r.returncode == 0:
            if attempt > 1:
                print(
                    f"# TPU back after {time.time() - t0:.0f}s "
                    f"({attempt} probes)",
                    file=sys.stderr,
                )
            return
        if time.time() - t0 > max_wait_s:
            raise RuntimeError(
                f"TPU did not come back within {max_wait_s:.0f}s "
                f"({attempt} probes); last stderr: "
                + r.stderr.decode(errors="replace").strip()[-500:]
            )
        if attempt == 1:
            print(
                "# TPU probe failed (chip down or tunnel wedged); retrying "
                f"for up to {max_wait_s:.0f}s",
                file=sys.stderr,
            )
        time.sleep(120)


def build_workload():
    import tnqs
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.heavy_hexagonal_lattice(2, 2) if FAST else tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    chi = 8 if FAST else 64
    return g, layer, chi


def bench_engine(g, layer, chi, steps, trunc=None):
    import jax
    import jax.numpy as jnp

    import tnqs
    from tnqs.engine import LatticeEngine

    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=chi, dtype=jnp.complex64)
    if trunc is not None:
        eng.trunc_method = trunc
    # host dispatch costs ~43 ms per call on the tunneled backend (measured
    # in scripts/microbench_gate.py) — ~17% of a layer; fuse several layers
    # per dispatch (fori_loop body compiled once, same math)
    fuse = max(1, int(os.environ.get("TNQS_BENCH_FUSE", "5")))
    while steps % fuse:
        fuse -= 1
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=25, layers_per_call=fuse)

    # On tunneled-TPU (axon) backends `block_until_ready` returns before
    # execution finishes, so the timed region must end with a host fetch of
    # a scalar that depends on every output.  The probe is compiled once.
    @jax.jit
    def probe(T, M, errors):
        h = jnp.real(jnp.sum(errors))
        h = h + jnp.real(jnp.sum(M)).astype(h.dtype)
        for arr in T.values():
            h = h + jnp.real(jnp.sum(arr)).astype(h.dtype)
        # 0-d outputs cannot be fetched through tunneled backends; ship (1,1)
        return jnp.full((1, 1), h)

    def fetch(T, M, errors):
        val = float(np.asarray(probe(T, M, errors))[0, 0])
        # a NaN anywhere in the state poisons the sum: a throughput number
        # on a non-finite state is void (this caught a real regression —
        # see docs/performance.md "the NaN hunt")
        if not np.isfinite(val):
            raise RuntimeError("benchmark state went non-finite; timing void")
        return val

    # warm-up: compile step + probe, run one real step
    t0 = time.time()
    T, M, errors = step(eng.T, eng.M)
    fetch(T, M, errors)
    compile_s = time.time() - t0
    from tnqs.utils.profiling import trace_from_env

    t0 = time.time()
    with trace_from_env():  # TNQS_PROFILE=<dir> -> xprof trace of the loop
        for _ in range(steps // fuse):
            T, M, errors = step(T, M)
        fetch(T, M, errors)  # forces the whole chain; ~25ms, amortized
    dt = (time.time() - t0) / steps
    eng.T, eng.M = T, M  # evolved state, for the chi=64 measurement stage
    return 1.0 / dt, compile_s, eng


def bench_flex(g, layer, chi):
    """One layer under the reference-style per-gate interpreted path (host).

    Bond dimensions double per kicked-Ising layer, so the state must be
    warmed ceil(log2(chi)) + 1 layers before timing — the engine runs every
    layer at the padded steady-state cost, and timing the flex tier at the
    small early-layer bonds would flatter the baseline by an order of
    magnitude (round-1 bug: one warm layer timed chi=64 work at bond 4).
    """
    import math

    import tnqs

    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi)
    apply_kwargs = dict(cutoff=1e-12, maxdim=chi, normalize_tensors=True)
    warm = max(1, math.ceil(math.log2(max(chi, 2))) + 1)
    for _ in range(warm):
        bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=apply_kwargs)
    t0 = time.time()
    bpc, _ = tnqs.apply_gates(layer, bpc, apply_kwargs=apply_kwargs)
    dt = time.time() - t0
    return 1.0 / dt


def bench_chi64_measurement(eng, cache: dict):
    """Round-3 stage: boundary-MPS measurement of the FLAGSHIP chi=64
    evolved state on device (verdict item 3 — round 2 never demonstrated an
    accurate measurement path at the benchmark bond dimension).

    Times compiled BMPS <Z> on the two probe vertices (golden central (7,8)
    and the workload-2 vertex (11,5)) at MPS rank 16 with an 8-wide
    oversampled sketch, a rank-24 control (sweep-convergence evidence), and
    50 directly-certified samples.  The flex cross-check (host, rank 10 —
    the reference's own measurement rank, `heavyhexIsing_dynamics.jl`) is
    measured once per host and cached."""
    import jax

    from tnqs.bmps_engine import BMPSEngine, BMPSSampler

    verts = [(7, 8), (11, 5)]
    be = BMPSEngine(eng, rank=16)
    t0 = time.time()
    z16 = be.expect_1site("Z", vertices=verts)
    t_expect_cold = time.time() - t0
    t0 = time.time()
    z16 = be.expect_1site("Z", vertices=verts)
    t_expect = time.time() - t0
    # rank-24 control WITH the subspace power iteration, via the split
    # per-column programs: the fused whole-sweep program at chi=64/rank=24
    # + power iters overruns the remote compile helper's memory (SIGKILL,
    # round-3 weak 7) — `split=True` compiles each column separately and
    # restores the stronger sketch for the convergence control
    z24 = BMPSEngine(eng, rank=24, power_iters=1).expect_1site(
        "Z", vertices=verts, split=True
    )
    z_bp = eng.expect_1site("Z")
    out = dict(
        z16={str(v): float(np.real(z16[v])) for v in verts},
        z24={str(v): float(np.real(z24[v])) for v in verts},
        z_bp={str(v): float(np.real(z_bp[v])) for v in verts},
        expect_s=t_expect,
        expect_cold_s=t_expect_cold,
    )
    # Sampling pays the doubled-layer environment walks PER SAMPLE (the
    # expectation amortizes them over the lattice), so its ranks are set by
    # compute: rank^2 * chi^4-scale flops per cross vertex per sample.
    # chunk=2: at chi=64 the projected-sweep intermediates are hundreds of
    # MB PER LIVE SAMPLE and XLA's scheduler keeps several in flight — the
    # full-width 50-sample vmap asks for ~27 GB and even a 5-wide lax.map
    # inside one fused program peaked ~19 GB (>16 GB HBM).  The sampler
    # therefore runs groups as SEPARATE host dispatches against shared
    # on-device norm boundary MPSes (BMPSSampler._build_group), so peak
    # HBM is one 2-sample group's working set.
    try:
        sam = BMPSSampler(BMPSEngine(eng, rank=8), proj_rank=16)
        cert = sam.sample_directly_certified(50, seed=0, chunk=2)
        t0 = time.time()
        cert = sam.sample_directly_certified(50, seed=1, chunk=2)
        t_sample = time.time() - t0
        pq = np.array([c["poverq"] for c in cert])
        out.update(
            sample50_s=t_sample,
            pq_mean=float(pq.mean()),
            pq_rel_std=float(pq.std() / pq.mean()),
        )
    except Exception as e:  # e.g. remote-compile helper SIGKILL (r4 run 1)
        # keep the expectation results — they are the accuracy evidence;
        # the sampler certificate is reported when it lands
        print(f"# chi64 sampler failed: {e!r}", file=sys.stderr)
        out.update(sample50_s=float("nan"), pq_mean=float("nan"),
                   pq_rel_std=float("nan"))
    # Host flex cross-check at the reference's rank: OPT-IN
    # (TNQS_BENCH_CHI64_FLEX=1) because the flex tier runs on the
    # chi-PADDED state — hours of single-core fitting at chi=64.  The
    # standing cross-checks are the rank-16-vs-24 agreement above, the BP
    # value, and the committed small-lattice engine-vs-flex BMPS gates in
    # `tests/test_bmps_engine.py`.  A cached value (one offline run) is
    # reused when present.
    if "chi64_flex_z" in cache:
        out["flex_z10"] = cache["chi64_flex_z"]
    elif os.environ.get("TNQS_BENCH_CHI64_FLEX"):
        import tnqs

        psi_t = eng.to_state()
        t0 = time.time()
        z = tnqs.expect(
            psi_t, [("Z", [verts[0]]), ("Z", [verts[1]])],
            alg="boundarymps", mps_bond_dimension=10,
        )
        out["flex_z10"] = {
            str(verts[0]): float(np.real(z[0])),
            str(verts[1]): float(np.real(z[1])),
            "seconds": time.time() - t0,
        }
        cache["chi64_flex_z"] = out["flex_z10"]
    return out


def bench_workload2_engine():
    """BASELINE workload 2 at the reference's own parameters
    (`/root/reference/examples/heavyhexIsing_dynamics.jl`): Eagle-127,
    20 kicked-Ising layers at chi=8, boundary-MPS <Z> at MPS rank 10, and
    50 directly-certified samples — the full pipeline on the compiled tier.
    Returns steady-state stage timings (compiles are persistent-cached
    across processes) and the certification statistics."""
    import jax
    import jax.numpy as jnp

    import tnqs
    from tnqs.bmps_engine import BMPSEngine, BMPSSampler
    from tnqs.engine import LatticeEngine
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    eng = LatticeEngine(psi, chi=8, dtype=jnp.complex64)
    step = eng.make_step(layer, cutoff=1e-12, bp_maxiter=25)
    t0 = time.time()
    T, M = eng.T, eng.M
    for _ in range(20):
        T, M, errors = step(T, M)
    eng.T, eng.M = T, M
    be = BMPSEngine(eng, rank=10)
    z = be.expect_1site("Z")  # host fetch closes the evolve+expect region
    t_evolve_expect = time.time() - t0
    t0 = time.time()
    z = be.expect_1site("Z")
    t_expect = time.time() - t0
    # certified-sampling config: the committed rank sweep
    # (`scripts/probe_cert_noise_results.json`) picked factored-q proj 12
    # with 3 subspace power iterations (rel-std 3.0e-2 on-chip, vs 2.7e-1
    # for the r2-era doubled proj-40 config at comparable cost); the
    # deterministic exact-SVD emits (492a066) remove the remaining sketch
    # noise from every small step matrix
    sam = BMPSSampler(
        BMPSEngine(eng, rank=10, oversample=8, power_iters=3),
        proj_rank=12, q_mode="factored",
    )
    cert = sam.sample_directly_certified(50, seed=0)
    t0 = time.time()
    cert = sam.sample_directly_certified(50, seed=1)
    t_sample = time.time() - t0
    pq = np.array([c["poverq"] for c in cert])
    return dict(
        z_center=float(np.real(z[(11, 5)])),
        pq_mean=float(pq.mean()),
        pq_rel_std=float(pq.std() / pq.mean()),
        evolve_expect_s=t_evolve_expect,
        expect_s=t_expect,
        sample50_s=t_sample,
    )


def bench_workload2_flex(cache: dict | None):
    """The same pipeline on the host flex tier (reference execution model);
    measured once per host and cached."""
    if cache and "pq_rel_std" in cache.get("w2_flex", {}):
        return cache["w2_flex"]
    import tnqs
    from tnqs.models import heavy_hex_kicked_ising_layer

    g = tnqs.eagle_lattice()
    layer = heavy_hex_kicked_ising_layer(g, float(np.pi / 4), 0.4)
    psi = tnqs.tensornetworkstate(lambda v: "↑", g, "S=1/2", dtype=np.complex64)
    bpc = tnqs.BeliefPropagationCache(psi)
    t0 = time.time()
    for _ in range(20):
        bpc, _ = tnqs.apply_gates(
            layer, bpc, apply_kwargs=dict(cutoff=1e-12, maxdim=8, normalize_tensors=True)
        )
    t_evolve = time.time() - t0
    psi_t = bpc.network
    t0 = time.time()
    sz = tnqs.expect(psi_t, [("Z", [(11, 5)])], alg="boundarymps", mps_bond_dimension=10)
    t_expect = time.time() - t0
    t0 = time.time()
    cert = tnqs.sample_directly_certified(
        psi_t, 50, alg="boundarymps", norm_mps_bond_dimension=10,
        projected_mps_bond_dimension=40, rng=np.random.default_rng(0),
    )
    t_sample = time.time() - t0
    pq = np.array([np.real(c["poverq"]) for c in cert])
    return dict(
        z_center=float(np.real(sz[0])),
        evolve_s=t_evolve,
        expect_s=t_expect,
        sample50_s=t_sample,
        pq_mean=float(pq.mean()),
        pq_rel_std=float(pq.std() / pq.mean()),
    )


def flex_overhead_probe(g, layer) -> float:
    """Seconds for one chi=2 flex layer (interpreter/bookkeeping-dominated,
    BLAS negligible).  Doubles as (a) the subtrahend of the CPU-Julia BLAS
    bound and (b) the load-contamination detector for the cached chi=64
    flex baseline (verdict r3 weak 2): both the chi=2 and chi=64 layers are
    single-core host work, so a cached baseline recorded at a much slower
    chi=2 time than a fresh probe was measured on a loaded host."""
    return 1.0 / bench_flex(g, layer, 2)


def julia_bound_lps(g, layer, chi, flex_lps, t_overhead=None):
    """BLAS-bound upper estimate of CPU-Julia layers/sec on this host.

    No Julia exists in this environment, so bound it from above: the
    reference (ITensors -> threaded BLAS/LAPACK) and our flex tier execute
    the same dense kernel sequence; Julia strips (most of) the interpreter
    overhead but cannot beat the BLAS time itself.  Measure the flex layer
    at a tiny bond dimension (chi=2: pure interpreter/bookkeeping, BLAS
    negligible) and subtract: T_blas(chi) ~ T_flex(chi) - T_flex(2), so
    CPU-Julia <= 1 / T_blas layers/sec.  Derivation + measured numbers in
    `docs/performance.md`.
    """
    t_full = 1.0 / flex_lps
    if t_overhead is None:
        t_overhead = flex_overhead_probe(g, layer)
    t_blas = t_full - t_overhead
    if chi < 32 or t_blas < 0.2 * t_full:
        # overhead-dominated regime (smoke configs): the subtraction is
        # noise and the bound is uninformative
        return float("nan")
    return 1.0 / t_blas


def main():
    stages: dict[str, float] = {}
    acquire_tpu_lock()
    wait_for_tpu()
    g, layer, chi = build_workload()
    steps = int(os.environ.get("TNQS_BENCH_STEPS", "5" if FAST else "20"))
    t0 = time.time()
    layers_per_sec, compile_s, eng = bench_engine(g, layer, chi, steps)
    stages["evolve"] = round(time.time() - t0, 1)

    # The flex baseline is a host-CPU measurement and stable across runs, so
    # reuse the cached value unless forced — but only a cache produced on
    # THIS host (keyed by hostname), so a committed/foreign cache is never
    # silently divided into a local engine measurement; AND only after a
    # fresh chi=2 probe agrees with the cached probe within 2x (round-3
    # verdict weak 2: a baseline recorded while the TPU queue shared this
    # single core was ~3x slow and would have ~3x-inflated vs_baseline).
    import socket

    host = socket.gethostname()
    cached: dict = {}
    if CACHE.exists():
        c = json.loads(CACHE.read_text())
        if c.get("chi") == chi and c.get("nv") == g.nv() and c.get("host") == host:
            cached = c
    t0 = time.time()
    probe_s = flex_overhead_probe(g, layer)  # fresh; seconds per chi=2 layer
    flex_lps = julia_lps = None
    if not os.environ.get("TNQS_BENCH_FORCE_FLEX"):
        ref_probe = cached.get("overhead_s")
        if ref_probe and max(probe_s, ref_probe) <= 2.0 * min(probe_s, ref_probe):
            flex_lps = cached.get("layers_per_sec")
            julia_lps = cached.get("julia_bound_lps")
        elif cached:
            print(
                f"# cached flex baseline rejected as load-contaminated: "
                f"cached chi=2 probe {ref_probe}s vs fresh {probe_s:.2f}s; "
                "re-measuring",
                file=sys.stderr,
            )
    if flex_lps is None or julia_lps is None:
        flex_lps = bench_flex(g, layer, chi)
        julia_lps = julia_bound_lps(g, layer, chi, flex_lps, t_overhead=probe_s)
        cached.update(
            chi=chi, nv=g.nv(), host=host, overhead_s=probe_s,
            layers_per_sec=flex_lps, julia_bound_lps=julia_lps,
        )
        CACHE.write_text(json.dumps(cached))
    stages["flex_baseline"] = round(time.time() - t0, 1)

    # ---- headline: printed (flushed) BEFORE any optional stage, so a
    # driver timeout downstream still captures it (round-3 missing #1) ----
    result = {
        "metric": f"heavy-hex {g.nv()}q kicked-Ising gate-layers/sec @ chi={chi}",
        "value": round(layers_per_sec, 4),
        "unit": "layers/sec",
        "vs_baseline": round(layers_per_sec / flex_lps, 2),
    }
    # analytic FLOP/roofline accounting (host-side, priced off the static
    # plan — adds no device work): achieved FLOP/s and MFU vs the v5e
    # f32-highest matmul ceiling (`tnqs/utils/flops.py` documents the model)
    try:
        from tnqs.utils.flops import layer_flops, mfu

        fl = layer_flops(eng, layer)
        roof = mfu(fl["total"], layers_per_sec)
        result["flops_per_layer"] = round(fl["total"], 1)
        result["achieved_tflops"] = round(roof["achieved_flops"] / 1e12, 4)
        result["mfu"] = round(roof["mfu"], 5)
    except Exception as e:  # never let accounting kill the headline
        print(f"# flop accounting failed: {e!r}", file=sys.stderr)
    print(json.dumps(result), flush=True)

    def budget_ok(stage: str, est_s: float) -> bool:
        rem = remaining_budget()
        if est_s <= rem:
            return True
        print(
            f"# stage {stage} skipped: est {est_s:.0f}s > remaining "
            f"budget {rem:.0f}s (TNQS_BENCH_BUDGET={BUDGET:.0f})",
            file=sys.stderr,
        )
        return False

    # chi=64 measurement stage on the evolved flagship state (round 3)
    m64 = None
    if (
        not FAST
        and not os.environ.get("TNQS_BENCH_SKIP_CHI64")
        and budget_ok("chi64_measure", 300 if cached.get("chi64_flex_z") else 420)
    ):
        t0 = time.time()
        try:
            m64 = bench_chi64_measurement(eng, cached)
        except Exception as e:  # never let an optional stage kill the run
            print(f"# chi64 measurement stage failed: {e!r}", file=sys.stderr)
        stages["chi64_measure"] = round(time.time() - t0, 1)
        if m64 is not None and "chi64_flex_z" in cached:
            cached.update(chi=chi, nv=g.nv(), host=host)
            CACHE.write_text(json.dumps(cached))

    # fast mode: the same evolve with subspace truncation — ~2.4x the
    # production throughput at the documented ~2e-3/10-layer accuracy
    # envelope (`tests/golden/tpu_parity_chi64_subspace.json`).  Reported
    # alongside the headline so the accuracy/throughput trade is visible;
    # the headline stays the production (parity-grade) configuration.
    fast_lps = None
    if (
        not FAST
        and not os.environ.get("TNQS_BENCH_SKIP_FASTMODE")
        and budget_ok("fast_mode", 2.0 * stages["evolve"])
    ):
        try:
            t0 = time.time()
            fast_lps, fast_compile_s, _ = bench_engine(
                g, layer, chi, steps, trunc="subspace"
            )
            stages["fast_mode"] = round(time.time() - t0, 1)
        except Exception as e:  # non-finite state or compile failure
            print(f"# fast-mode stage failed: {e!r}", file=sys.stderr)

    # workload 2 (reference parameters): compiled pipeline + flex baseline
    w2 = w2_flex = None
    if (
        not FAST
        and not os.environ.get("TNQS_BENCH_SKIP_W2")
        and budget_ok(
            "w2", 300 + (0 if "pq_rel_std" in cached.get("w2_flex", {}) else 500)
        )
    ):
        t0 = time.time()
        # independent fences: an engine-tier compile failure must not
        # abort the (cacheable) flex measurement, or vice versa — the r4
        # run-1 vmem OOM in the engine stage cost the w2_flex cache write
        try:
            w2 = bench_workload2_engine()
        except Exception as e:  # never let an optional stage kill the run
            print(f"# w2 engine stage failed: {e!r}", file=sys.stderr)
        try:
            w2_flex = bench_workload2_flex(cached)
        except Exception as e:
            print(f"# w2 flex stage failed: {e!r}", file=sys.stderr)
        stages["w2"] = round(time.time() - t0, 1)
        if w2_flex is not None and "pq_rel_std" not in cached.get("w2_flex", {}):
            cached["w2_flex"] = w2_flex
            cached.update(chi=chi, nv=g.nv(), host=host)
            CACHE.write_text(json.dumps(cached))

    if w2 is not None and w2_flex is not None:
        w2_total = w2["expect_s"] + w2["sample50_s"]
        w2f_total = w2_flex["expect_s"] + w2_flex["sample50_s"]
        result["w2_measure_s"] = round(w2_total, 3)
        result["w2_flex_measure_s"] = round(w2f_total, 2)
        # measurement stages only (expect + sampling), evolution excluded
        result["w2_measure_speedup"] = round(w2f_total / w2_total, 1)
        # certification-noise closure evidence (round-3 verdict item 3):
        # compiled vs flex p/q spread at the reference's w2 parameters
        result["w2_pq_rel_std"] = round(w2["pq_rel_std"], 6)
        result["w2_flex_pq_rel_std"] = round(w2_flex["pq_rel_std"], 6)
    if m64 is not None:
        result["chi64_measure_s"] = round(
            float(np.nansum([m64["expect_s"], m64["sample50_s"]])), 3
        )
        # provenance of the rank-10 flex cross-check: 'cpu-engine' means it
        # was measured offline against a CPU-engine evolution of the same
        # trajectory, NOT the TPU state measured above (advisor r4) — the
        # key makes that visible in the driver-parsed JSON
        if "flex_z10" in m64:
            result["chi64_flex_z10_state"] = m64["flex_z10"].get(
                "state", "same-state"
            )
        result["chi64_pq_rel_std"] = (
            round(m64["pq_rel_std"], 5) if m64["pq_rel_std"] == m64["pq_rel_std"]
            else None
        )
    if fast_lps is not None:
        result["fast_mode_layers_per_sec"] = round(fast_lps, 4)
    if m64 is not None or fast_lps is not None or w2 is not None:
        # enriched reprint: same headline keys, plus optional-stage keys and
        # the per-stage wall-clock map (round-3 verdict item 9) — tail
        # parsers and the early-print parser see identical headline values
        result["stages"] = stages
        print(json.dumps(result), flush=True)
    julia_note = (
        f"BLAS-bound CPU-Julia estimate <= {julia_lps:.3f} layers/s "
        f"(vs_julia_bound >= {layers_per_sec / julia_lps:.2f}x)"
        if julia_lps == julia_lps  # not NaN
        else "CPU-Julia bound n/a (overhead-dominated smoke config)"
    )
    fast_note = (
        f" fast-mode (subspace): {fast_lps:.3f} layers/s "
        f"(compile {fast_compile_s:.1f}s);"
        if fast_lps is not None
        else ""
    )
    print(
        f"# engine: {layers_per_sec:.3f} layers/s (compile {compile_s:.1f}s);"
        + fast_note
        + f" flex/reference-style: {flex_lps:.4f} layers/s; " + julia_note,
        file=sys.stderr,
    )
    if m64 is not None:
        fz = m64.get("flex_z10", {})
        if fz.get("state"):
            print(f"# chi64 flex_r10 provenance: {fz['state']}", file=sys.stderr)
        print(
            f"# chi=64 measurement: BMPS<Z> rank16 {m64['expect_s']:.2f}s "
            f"(cold {m64['expect_cold_s']:.1f}s) + 50 certified samples "
            f"{m64['sample50_s']:.2f}s, p/q rel-std {m64['pq_rel_std']:.2e}; "
            f"Z(7,8): r16={m64['z16']['(7, 8)']:.4f} r24={m64['z24']['(7, 8)']:.4f} "
            f"bp={m64['z_bp']['(7, 8)']:.4f} flex_r10={fz.get('(7, 8)', float('nan')):.4f}; "
            f"Z(11,5): r16={m64['z16']['(11, 5)']:.4f} r24={m64['z24']['(11, 5)']:.4f} "
            f"bp={m64['z_bp']['(11, 5)']:.4f} flex_r10={fz.get('(11, 5)', float('nan')):.4f}",
            file=sys.stderr,
        )
    if w2 is not None:
        print(
            "# workload-2 (chi=8, rank=10): engine BMPS<Z> "
            f"{w2['expect_s']:.2f}s + 50 certified samples {w2['sample50_s']:.2f}s "
            f"(flex: {w2_flex['expect_s']:.1f}s + {w2_flex['sample50_s']:.1f}s); "
            f"<Z>c={w2['z_center']:.4f} (flex {w2_flex['z_center']:.4f}); "
            f"p/q rel-std {w2['pq_rel_std']:.2e} (flex {w2_flex.get('pq_rel_std', float('nan')):.2e})",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
