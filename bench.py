"""End-to-end OCR throughput benchmark (driver-run on real TPU).

Measures steady-state receipts/sec/chip through the single-program
batched path (`serving.batch.BatchedOCR`): CRAFT forward -> on-device box
extraction -> original-image crops -> CRNN (TPS+ResNet+BiLSTM+Attention)
over max_boxes crops per receipt.

Honest methodology:
* throughput is measured over a pipelined steady state (``--depth``
  dispatches in flight, default ``Config.serving_depth``) so host work
  overlaps device compute the way a serving loop runs — not a lone
  dispatch with ``min()``; the depth <-> (r/s, p50, p95) frontier is
  tabulated in BENCH.md;
* ``--mesh data=N`` routes through the ``BatchedOCR(mesh=...)``
  shard_map data-parallel path and reports aggregate + per-chip r/s;
* host-side text DECODING of every result is inside the timed loop;
* reported throughput uses the TOTAL wall time of all timed dispatches
  (median-free), and per-dispatch latency is reported as p50.

Prints EXACTLY ONE JSON line on stdout: {"metric", "value", "unit",
"vs_baseline"} where vs_baseline is value / 200 (the >=200
receipts/sec/chip BASELINE target).  A PROVISIONAL measurement over
the first dispatches goes to stderr as soon as the first timed window
lands; if the run is killed (SIGTERM/timeout) before the final
steady-state line, an exit handler promotes the provisional line to
stdout — so a truncated run still leaves exactly one parseable number.
``--full`` adds secondary lines (p50 latency, 64-concurrent config-5
run) to stderr.

Cold-start cost: the serving program loads from the persistent AOT
executable cache (``.aotcache/``, see ``utils/aotcache.py``) in
seconds; only an unwarmed cache pays the tunnel's 10-40 min remote
compile.  ``LIGHTLY_OCR_BENCH_BUDGET_S`` (default 3000) bounds total
wall time: after warmup the timed window is sized to what fits.

CACHE-KEY WARNING: editing THIS FILE (even a comment) shifts the
Mosaic location table embedded in the lowered program and re-keys the
AOT cache — after any edit here or in the serving/model/Pallas files,
re-run ``python bench.py`` once (cold) and commit the fresh ``.jexe``
so the driver's run stays warm.  Details: utils/aotcache.py docstring.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import deque

import numpy as np

# Amortize the tunnel's multi-minute XLA compiles across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

_T_START = time.perf_counter()

# stdout carries EXACTLY ONE JSON line per run (the driver contract).
# The provisional early measurement goes to stderr; it is promoted to
# stdout only by the exit fallback below, when the run is killed before
# the final line lands.
_FALLBACK = {"line": None, "done": False}


def _json_line(metric: str, rps: float) -> str:
    return json.dumps(
        {
            "metric": metric,
            "value": round(rps, 3),
            "unit": "receipts/s",
            "vs_baseline": round(rps / 200.0, 4),
        }
    )


def _emit(metric: str, rps: float) -> None:
    print(_json_line(metric, rps), flush=True)
    _FALLBACK["done"] = True


def _emit_provisional(metric: str, rps: float, dispatches: int) -> None:
    # The window size is part of the label: a provisional number over a
    # handful of dispatches includes pipeline fill and must not be
    # compared against full steady-state lines across rounds.
    line = _json_line(
        f"{metric} [provisional, {dispatches}-dispatch window incl. "
        "pipeline fill]",
        rps,
    )
    print(line, file=sys.stderr, flush=True)
    _FALLBACK["line"] = line


def _flush_fallback(*_args) -> None:
    if not _FALLBACK["done"] and _FALLBACK["line"]:
        print(_FALLBACK["line"], flush=True)
        _FALLBACK["done"] = True
    if _args:  # invoked as a signal handler (timeout sends SIGTERM)
        raise SystemExit(124)


import atexit
import signal

atexit.register(_flush_fallback)
signal.signal(signal.SIGTERM, _flush_fallback)


def _steady_state(ocr, canvases, gray, inv_ratio, batch, dispatches, depth):
    """Pipelined run: keep ``depth`` dispatches in flight, decode every
    finished result on the host inside the timed window.

    Returns (receipts_per_s, p50_latency_s, p95, sample, completions)
    where ``completions`` are the per-dispatch completion timestamps
    relative to the window start — the sub-window rates below are
    computed from them.
    """
    import jax

    pending = deque()
    latencies = []
    completions = []
    sample = None
    t0 = time.perf_counter()
    for i in range(dispatches):
        t_submit = time.perf_counter()
        out = ocr(canvases, gray, inv_ratio)  # async dispatch
        pending.append((t_submit, out))
        while len(pending) > depth:
            ts, o = pending.popleft()
            jax.block_until_ready(o["confidence"])
            sample = ocr.decode(o)  # host decode counted
            now = time.perf_counter()
            latencies.append(now - ts)
            completions.append(now - t0)
    while pending:
        ts, o = pending.popleft()
        jax.block_until_ready(o["confidence"])
        sample = ocr.decode(o)
        now = time.perf_counter()
        latencies.append(now - ts)
        completions.append(now - t0)
    total = time.perf_counter() - t0
    rps = batch * dispatches / total
    p50 = float(np.median(latencies))
    p95 = float(np.percentile(latencies, 95))
    return rps, p50, p95, sample, completions


def _subwindow_rates(completions, batch, k=3):
    """Split the steady-state window into ``k`` contiguous sub-windows
    (by dispatch-completion order) and return each sub-window's
    receipts/s.  The median of these damps transient host/tunnel-band
    weather that a single total-window number absorbs wholesale
    (VERDICT r4 #1b); the first sub-window includes pipeline fill, so
    with 96 dispatches at depth 4 the fill skews it by <5%."""
    n = len(completions)
    if n < 2 * k:
        return []
    rates, prev = [], 0.0
    for i in range(k):
        chunk = completions[(i * n) // k:((i + 1) * n) // k]
        rates.append(len(chunk) * batch / (chunk[-1] - prev))
        prev = chunk[-1]
    return rates


def _device_ms_from_trace(trace_dir):
    """Total device-side duration (ms) of jit executable runs in the
    newest ``*.trace.json.gz`` under ``trace_dir`` (same parser as
    scripts/profile_trace.py), or None."""
    import glob
    import gzip

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return None
    with gzip.open(sorted(files)[-1]) as f:
        tr = json.load(f)
    jit_total = 0.0
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e["name"]
        if name.startswith("jit_") and "(" in name:
            jit_total += e["dur"] / 1e3
    return jit_total or None


def _diagnostics(ocr, canvases, gray, inv_ratio, batch):
    """Post-measurement attribution block (stderr only) so a driver-run
    tail names WHERE a slow number came from: 6 serial (depth-1)
    dispatch walls isolate per-dispatch host+RPC+device cost from
    pipelining, and one jax.profiler-traced dispatch splits that into
    device execution vs host/tunnel band (VERDICT r4 #1a)."""
    import shutil
    import tempfile

    import jax

    walls = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = ocr(canvases, gray, inv_ratio)
        jax.block_until_ready(out["confidence"])
        ocr.decode(out)
        walls.append(time.perf_counter() - t0)
    w50 = float(np.median(walls))
    print(
        "diag serial (depth-1) dispatch wall: p50 "
        f"{w50*1e3:.1f} ms over 6 "
        f"[{', '.join(f'{w*1e3:.0f}' for w in walls)}]",
        file=sys.stderr, flush=True,
    )
    tdir = tempfile.mkdtemp(prefix="benchtrace_")
    try:
        with jax.profiler.trace(tdir):
            out = ocr(canvases, gray, inv_ratio)
            jax.block_until_ready(out["confidence"])
        dev_ms = _device_ms_from_trace(tdir)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    if dev_ms:
        print(
            f"diag device execution: {dev_ms:.1f} ms/dispatch "
            f"(device-bound ceiling {batch/dev_ms*1e3:.1f} r/s); "
            f"host+RPC band = serial wall {w50*1e3:.1f} - device "
            f"{dev_ms:.1f} = {w50*1e3-dev_ms:.1f} ms",
            file=sys.stderr, flush=True,
        )
    else:
        print("diag device execution: no jit events in trace",
              file=sys.stderr, flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16, help="receipts per dispatch")
    p.add_argument("--boxes", type=int, default=32, help="word boxes per receipt")
    p.add_argument("--dispatches", type=int, default=96,
                   help="timed dispatches in the steady-state window. "
                        "96 x batch-16 ~ 10 s of steady state: long "
                        "enough that the recorded number is not a "
                        "2-second snapshot of tunnel luck (the budget "
                        "guard below shrinks it when the compile ate "
                        "the window)")
    p.add_argument("--depth", type=int, default=None,
                   help="dispatches kept in flight (pipelining). "
                        "Default: Config.serving_depth (4 — the knee "
                        "on the seam-kernel graph, same-hour: d3 161.8 "
                        "/ d4 165.3 / d5 158.4 r/s; see the BENCH.md "
                        "depth table for the latency frontier)")
    p.add_argument("--mesh", default=None, metavar="data=N",
                   help="run the shard_map data-parallel serving path "
                        "over an N-device mesh and report aggregate + "
                        "per-chip r/s.  Correctness-testable today on "
                        "the virtual CPU mesh (XLA_FLAGS=--xla_force_"
                        "host_platform_device_count=N JAX_PLATFORMS="
                        "cpu); one command the day multi-chip TPU "
                        "hardware exists.  batch must divide by N.")
    p.add_argument("--receipt-h", type=int, default=600)
    p.add_argument("--receipt-w", type=int, default=400)
    p.add_argument("--prediction", default="Attention",
                   choices=["Attention", "CTC"])
    p.add_argument("--fp32", action="store_true",
                   help="disable bfloat16 compute")
    p.add_argument("--int8", dest="int8", action="store_true", default=True,
                   help="w8a8 dynamic int8 backbone convs (v5e int8 MXU; "
                        "the default serving mode — parity-gated by "
                        "tests/test_quant.py)")
    p.add_argument("--bf16", dest="int8", action="store_false",
                   help="disable int8: bf16 backbone convs")
    p.add_argument("--granularity", type=int, default=None,
                   help="canvas bucket granularity override (default: config)")
    p.add_argument("--magnify", type=float, default=None,
                   help="magnification override (canvas-frontier A/B, "
                        "scripts/check_canvas_frontier.py; default: config)")
    p.add_argument("--full", action="store_true",
                   help="also run the 64-concurrent config-5 measurement")
    p.add_argument("--stage-times", action="store_true",
                   help="time the detector-scores and postprocess "
                        "dispatch units separately (TPU split path)")
    args = p.parse_args(argv)
    if args.fp32:
        args.int8 = False

    # Surface aotcache hit/store lines to stderr when asked — the mint
    # script (scripts/mint_serving_exe.sh) greps them to verify the
    # committed executable actually loads warm.  stdout stays JSON-only.
    import logging

    logging.basicConfig(
        level=os.environ.get("LIGHTLY_OCR_LOGLEVEL", "WARNING").upper(),
        stream=sys.stderr,
    )
    # aotcache hit/store/miss lines are INFO — surface them in EVERY
    # run (the driver runs at the default WARNING root level, which
    # made round 4's cache status invisible in the recorded tail;
    # VERDICT r4 #1a).  stdout stays JSON-only either way.
    logging.getLogger("lightly_ocr_tpu.utils.aotcache").setLevel(
        logging.INFO
    )

    import jax

    # Mirror tests/conftest.py: the ambient env exports JAX_PLATFORMS=
    # axon (the TPU tunnel) and plugin registration can win over a
    # user's JAX_PLATFORMS=cpu — honor the explicit CPU request so
    # `--mesh data=N` is testable on the virtual CPU mesh.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from lightly_ocr_tpu.config import Config
    from lightly_ocr_tpu.engines import CRAFT, CRNN
    from lightly_ocr_tpu.ops.image import (
        make_detector_input,
        pick_canvas_bucket,
        plan_aspect_resize,
        rgb_to_gray,
    )
    from lightly_ocr_tpu.serving.batch import BatchedOCR

    devs = jax.devices()
    print(
        f"env: jax {jax.__version__}, backend {jax.default_backend()}, "
        f"{len(devs)}x {devs[0].device_kind}",
        file=sys.stderr, flush=True,
    )

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = Config(prediction=args.prediction, transform="TPS",
                 max_boxes=args.boxes, quant_int8=args.int8,
                 **({"bucket_granularity": args.granularity}
                    if args.granularity else {}),
                 **({"magnify_ratio": args.magnify}
                    if args.magnify else {}))
    if args.depth is None:
        args.depth = cfg.serving_depth

    mesh = None
    if args.mesh:
        from lightly_ocr_tpu.parallel.mesh import make_mesh

        m = dict(kv.split("=") for kv in args.mesh.split(","))
        n_data = int(m.pop("data", len(jax.devices())))
        if m:
            p.error(f"--mesh: unknown axes {sorted(m)} (only data=N)")
        if args.batch % n_data:
            p.error(f"--mesh data={n_data}: batch {args.batch} must "
                    "divide by the data axis")
        if n_data > len(jax.devices()):
            p.error(f"--mesh data={n_data}: only {len(jax.devices())} "
                    "devices visible")
        mesh = make_mesh(data=n_data, devices=jax.devices()[:n_data])

    # Build engines (random weights unless checkpoints exist in
    # cfg.pretrained) and the fused batch program.
    det = CRAFT(cfg, dtype=dtype)
    rec = CRNN(cfg, dtype=dtype)
    ocr = BatchedOCR(cfg, det.variables, rec.variables,
                     boxes_per_image=args.boxes, dtype=dtype,
                     mesh=mesh)

    # Synthetic receipt batch -> canvases on device (ingest-side prep).
    rng = np.random.default_rng(0)
    h, w = args.receipt_h, args.receipt_w
    bucket = pick_canvas_bucket(h, w, cfg.canvas_size, cfg.magnify_ratio,
                                granularity=cfg.bucket_granularity)
    plan = plan_aspect_resize(h, w, cfg.canvas_size, cfg.magnify_ratio,
                              canvas_bucket=bucket)
    receipts = rng.integers(0, 256, (args.batch, h, w, 3)).astype(np.float32)
    canv, grays = [], []
    for img in receipts:
        c, _ = make_detector_input(jnp.asarray(img), plan)
        canv.append(c)
        grays.append(rgb_to_gray(jnp.asarray(img)))  # original resolution
    canvases = jnp.stack(canv)
    gray = jnp.stack(grays)
    inv_ratio = 1.0 / plan.ratio

    mesh_tag = ""
    if mesh is not None:
        n_data = mesh.shape["data"]
        mesh_tag = f", mesh data={n_data} [aggregate]"
    metric = (
        f"receipts/sec{'' if mesh is not None else '/chip'} "
        "steady-state incl. host decode "
        f"(canvas {plan.canvas_h}x{plan.canvas_w}, "
        f"{args.boxes} boxes/receipt, batch {args.batch}, "
        f"depth {args.depth}, {args.prediction}, "
        f"{'fp32' if args.fp32 else 'int8' if args.int8 else 'bf16'}"
        f"{mesh_tag})"
    )
    budget = float(os.environ.get("LIGHTLY_OCR_BENCH_BUDGET_S", "3000"))

    # warmup / compile (2 dispatches so the pipelined path is warm too)
    for _ in range(2):
        out = ocr(canvases, gray, inv_ratio)
    jax.block_until_ready(out["confidence"])
    ocr.decode(out)

    # Provisional measurement over a short window: lands a parseable
    # stdout number within seconds of warmup even if the run is later
    # killed.  Also calibrates how many dispatches fit in the budget.
    t0 = time.perf_counter()
    rps0, _, _, _, _ = _steady_state(
        ocr, canvases, gray, inv_ratio, args.batch, max(2, args.depth),
        args.depth,
    )
    window = time.perf_counter() - t0
    _emit_provisional(metric, rps0, max(2, args.depth))
    per_dispatch = window / max(2, args.depth)
    remaining = budget - (time.perf_counter() - _T_START) - 30.0
    dispatches = args.dispatches
    if per_dispatch * dispatches > remaining:
        dispatches = max(2, int(remaining / per_dispatch))
        print(
            f"budget {budget:.0f}s: shrinking timed window to "
            f"{dispatches} dispatches",
            file=sys.stderr, flush=True,
        )

    rps, p50, p95, _, completions = _steady_state(
        ocr, canvases, gray, inv_ratio, args.batch, dispatches,
        args.depth,
    )
    # Official number: median of 3 contiguous sub-window rates — damps
    # transient host/tunnel-band weather a single total-window rate
    # absorbs wholesale (round 4: driver 153.05 vs same-HEAD mint
    # 175.5 with no code difference).  The total-window rate is on
    # stderr right below for continuity with rounds 1-4.
    sub = _subwindow_rates(completions, args.batch)
    if sub:
        official = float(np.median(sub))
        _emit(metric + " [median of 3 sub-windows]", official)
        print(
            f"sub-window r/s: "
            + " / ".join(f"{r:.1f}" for r in sub)
            + f" (median {official:.2f}); total-window {rps:.2f}",
            file=sys.stderr, flush=True,
        )
    else:
        _emit(metric, rps)
    print(
        f"p50 dispatch latency: {p50*1e3:.1f} ms, p95 {p95*1e3:.1f} ms "
        f"({p50*1e3/args.batch:.2f} ms/receipt amortized)",
        file=sys.stderr, flush=True,
    )
    try:
        _diagnostics(ocr, canvases, gray, inv_ratio, args.batch)
    except Exception as e:  # diagnostics must never take down the run
        print(f"diag block failed: {e!r}", file=sys.stderr, flush=True)
    if mesh is not None:
        print(
            f"mesh data={n_data}: {rps:.1f} r/s aggregate = "
            f"{rps/n_data:.1f} r/s/chip across {n_data} devices "
            f"({jax.devices()[0].device_kind}); DP bit-equality "
            "gated by tests/test_multichip.py",
            file=sys.stderr, flush=True,
        )

    if args.stage_times and not hasattr(ocr, "_stage_fns"):
        print(
            "--stage-times needs the split dispatch path "
            "(LIGHTLY_OCR_MONOLITH=0); skipping stage timings",
            file=sys.stderr, flush=True,
        )
    if args.stage_times and hasattr(ocr, "_stage_fns"):
        import jax as _jax

        scores_fn, post_fn = ocr._stage_fns
        dv, rv = ocr.det_variables, ocr.rec_variables
        y = scores_fn(dv, canvases)
        _jax.block_until_ready(y)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            _jax.block_until_ready(scores_fn(dv, canvases))
            ts.append(time.perf_counter() - t0)
        print(f"stage detector-scores: {np.median(ts)*1e3:.1f} ms wall",
              file=sys.stderr, flush=True)
        inv_b = jnp.full((gray.shape[0],), inv_ratio, jnp.float32)
        ext_b = jnp.tile(
            jnp.asarray([[gray.shape[1], gray.shape[2]]], jnp.float32),
            (gray.shape[0], 1),
        )
        _jax.block_until_ready(inv_b)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            _jax.block_until_ready(
                post_fn(rv, y, gray, inv_b, ext_b)["confidence"]
            )
            ts.append(time.perf_counter() - t0)
        print(f"stage postprocess: {np.median(ts)*1e3:.1f} ms wall",
              file=sys.stderr, flush=True)

    if args.full:
        # BASELINE config 5: 64 receipts in flight through the batched
        # path (batch x depth = 64)
        depth64 = max(1, 64 // args.batch)
        rps64, p5064, _, _, _ = _steady_state(
            ocr, canvases, gray, inv_ratio, args.batch,
            max(args.dispatches, 2 * depth64), depth64,
        )
        print(
            f"config-5 (64 concurrent = batch {args.batch} x depth "
            f"{depth64}): {rps64:.1f} receipts/s, p50 {p5064*1e3:.1f} ms",
            file=sys.stderr, flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
