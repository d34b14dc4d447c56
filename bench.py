#!/usr/bin/env python
"""Headline benchmark: VINCE ResNet50 pretrain step throughput (frames/sec/chip).

Measures the full jitted training step on the real TPU — on-device fused
augmentation + query fwd/bwd + momentum-encoder fwd + multi-pair InfoNCE
against the 65,536-entry queue + SGD + EMA + enqueue (the reference hot loop,
``vince_solver.py:386-518``, BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "step_ms",
"mxu_util", "config"}.

Wedge-proofing (round 4): the axon tunnel can wedge mid-run with the worker
thread blocked inside the runtime — unkillable from Python, so an in-process
watchdog can only abort, not retry. The measured section therefore runs in a
KILLABLE SUBPROCESS (``BENCH_INNER=1`` re-entry): the parent enforces the
per-attempt timeout, kills a wedged child, re-probes the backend, and retries
once (the persistent compile cache makes the retry cheap). The child streams
progress breadcrumbs (backend_up / compile_done / steps_done) to a file so a
wedge is diagnosable from the error record.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6). We
normalize against a documented estimate of the reference stack's per-GPU rate:
MoCo-style ResNet50 training at ~167 frames/sec per 2020-era datacenter GPU
(8-GPU host, MoCo's published 53h/200ep on ImageNet-1.28M ⇒ ~1340 img/s ÷ 8).
The reference's single-process DataParallel would be at or below this.

Spread protocol (round 5): a single 10-step sample was a coin flip over the
±3% same-day tunnel variance (docs/compiler_flags_r4.json: 66.1/67.5/69.5 ms
for identical code), so the headline is now the MEDIAN of BENCH_RUNS
(default 3) independent subprocess runs of BENCH_STEPS (default 30) timed
steps each, and the JSON carries a "spread" field
{runs, fps, step_ms, min, max, rel_spread} so round-over-round trends are
readable against the error bar. The persistent compile cache makes runs 2-3
cheap (~steps only).

Env overrides: BENCH_BATCH (default 128), BENCH_STEPS (default 30),
BENCH_RUNS (median-of-N subprocess runs, default 3),
BENCH_BACKBONE (ResNet50), BENCH_IMAGE (224), BENCH_QUEUE (65536),
BENCH_FUSED=1 (Pallas streaming InfoNCE kernel), BENCH_SE_KIND (mul|fold),
BENCH_TIMEOUT (per-attempt compute budget, s), BENCH_TUNNEL_WAIT (pre-flight),
BENCH_RETRIES (extra attempts after the first, per run, default 1),
BENCH_XLA_FLAGS (extra compiler options, comma-separated k=v — see
tools/exp_compiler_flags.py).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REFERENCE_BASELINE_FPS_PER_CHIP = 167.0
METRIC = "vince_pretrain_frames_per_sec_per_chip_rn50"


def _emit_error(msg: str, progress: dict) -> None:
    print(json.dumps({
        "metric": METRIC,
        "value": 0.0,
        "unit": "frames/s/chip",
        "vs_baseline": 0.0,
        "error": msg,
        "progress": progress,
    }))
    sys.stdout.flush()


def _wait_for_backend(max_wait_s: float) -> bool:
    """The axon tunnel can wedge for stretches (observed: ``jax.devices()``
    blocking indefinitely in-process, unkillable from Python). Probe it in a
    killable subprocess and wait for recovery before spending the compute
    budget on a doomed run. Returns False if it never comes up."""
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            res = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                capture_output=True, text=True, timeout=120,
            )
            if res.returncode == 0 and res.stdout.strip().isdigit():
                return True
        except (OSError, subprocess.TimeoutExpired):
            pass
        if time.time() >= deadline:
            return False
        print(f"# backend probe {attempt} failed (tunnel wedged?); retrying in 30s",
              file=sys.stderr)
        time.sleep(30)


def _read_progress(path: str) -> dict:
    """Best-effort read of the child's breadcrumb file (one JSON obj/line)."""
    progress = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    progress.update(json.loads(line))
    except (OSError, ValueError):
        pass
    return progress


def run_with_retry(child_cmd, timeout_s: float, retries: int,
                   progress_path: str, probe=None, env=None):
    """Run ``child_cmd`` (expected to print one JSON result line on stdout),
    killing and retrying on timeout/failure. Returns the parsed result dict or
    None after all attempts fail. ``probe`` (callable -> bool) gates each
    retry — a wedged tunnel gets time to recover before the budget is spent.

    Factored out so tests can drive the retry logic with a stub child command
    (tests/test_bench_retry.py) without touching a TPU.
    """
    last_err = "unknown"
    for attempt in range(1 + retries):
        if attempt > 0:
            print(f"# bench attempt {attempt} retrying after: {last_err}",
                  file=sys.stderr)
            if probe is not None and not probe():
                last_err += "; backend never recovered for retry"
                break
        try:
            res = subprocess.run(
                child_cmd, timeout=timeout_s, capture_output=True, text=True,
                env=env,
            )
        except subprocess.TimeoutExpired as e:
            # subprocess.run kills the wedged child on timeout; record how
            # far it got (breadcrumbs stay in the progress file)
            last_err = f"attempt {attempt}: no result within {timeout_s:.0f}s"
            err = e.stderr
            if isinstance(err, bytes):
                err = err.decode(errors="replace")
            sys.stderr.write((err or "")[-2000:])
            continue
        sys.stderr.write(res.stderr[-4000:] if res.stderr else "")
        if res.returncode != 0:
            tail = (res.stderr or "").strip().splitlines()[-1:]
            last_err = (f"attempt {attempt}: child exited rc={res.returncode}"
                        + (f": {tail[0]}" if tail else ""))
            continue
        for line in reversed(res.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except ValueError:
                    break
        last_err = f"attempt {attempt}: child produced no JSON result line"
    progress = _read_progress(progress_path)
    progress["last_error"] = last_err
    return {"_failed": True, "progress": progress}


def run_median_of(child_cmd, timeout_s, retries, n_runs, progress_path,
                  probe=None, env=None):
    """Median-of-N protocol: each run is its own killable subprocess (the
    persistent compile cache makes runs 2+ cheap); the median defeats the
    ±3% tunnel variance a single sample is hostage to. Returns
    ``(result_with_spread, last_failed)`` — result is None when every run
    failed. The reported record is the run closest to the median fps so
    value/step_ms/mxu_util cohere, plus a "spread" field with all samples.
    """
    runs, last_failed = [], None
    for i in range(n_runs):
        r = run_with_retry(
            child_cmd, timeout_s, retries, progress_path, probe=probe, env=env,
        )
        if r.get("_failed"):
            last_failed = r
            print(f"# bench run {i} failed: "
                  f"{r.get('progress', {}).get('last_error')}", file=sys.stderr)
        else:
            runs.append(r)
    if not runs:
        return None, last_failed
    fps_vals = sorted(r["value"] for r in runs)
    median_fps = float(np.median(fps_vals))
    result = min(runs, key=lambda r: abs(r["value"] - median_fps))
    result["spread"] = {
        "runs": len(runs),
        "requested_runs": n_runs,
        "fps": [r["value"] for r in runs],
        "step_ms": [r.get("step_ms") for r in runs],
        "min": fps_vals[0],
        "max": fps_vals[-1],
        "rel_spread": round((fps_vals[-1] - fps_vals[0]) / max(fps_vals[-1], 1e-9), 4),
    }
    return result, last_failed


def _progress_writer(path: str):
    def write(**kv):
        try:
            with open(path, "a") as f:
                f.write(json.dumps(kv) + "\n")
                f.flush()
        except OSError:
            pass
    return write


def run_bench(batch: int, steps: int, backbone: str, image: int,
              queue_size: int, note):
    import jax
    import jax.numpy as jnp
    import optax

    # Like the CLI's --platform: the sandbox sitecustomize force-registers the
    # axon TPU platform after import, so the env var alone can't select CPU
    # (tests/test_bench_retry.py uses this to smoke the inner path off-chip).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vince_tpu.parallel.mesh import MeshSpec, make_mesh
    from vince_tpu.solvers.vince_step import (
        SourceSpec,
        VinceConfig,
        init_vince_state,
        make_train_step,
        shard_state,
    )

    n_dev = 1  # bench contract: one real chip
    cfg = VinceConfig(
        sources=(
            SourceSpec("YT", batch_size=batch, num_frames=4,
                       transform="StandardVideoTransform", source_id=1),
        ),
        backbone=backbone,
        embed_size=128,  # R50 "large" config (train_vince_large.sh)
        image_size=image,
        queue_size=queue_size,
        temperature=0.07,
        momentum=0.999,
        compute_dtype=jnp.bfloat16,
        data_axis_size=n_dev,
        queue_axis_size=1,
        shuffle_bn=True,
        use_fused_infonce=bool(int(os.environ.get("BENCH_FUSED", "0"))),
        norm_kind=os.environ.get("BENCH_NORM", "batchnorm"),  # batchnorm|groupnorm
        remat=bool(int(os.environ.get("BENCH_REMAT", "0"))),
        stem_kind="s2d" if int(os.environ.get("BENCH_S2D", "1")) else "conv7",
        bn_fold=os.environ.get("BENCH_BN_FOLD", "expand"),  # none|expand|all
        fold_kernel=bool(int(os.environ.get("BENCH_FOLD_KERNEL", "0"))),
        dw_kind=os.environ.get("BENCH_DW_KIND", "conv"),  # conv|tap (EfficientNet)
        se_kind=os.environ.get("BENCH_SE_KIND", "mul"),  # mul|fold (EfficientNet)
        jitter_order=os.environ.get("BENCH_JITTER", "torchvision"),  # |fixed
    )
    mesh = make_mesh(MeshSpec(data_axis_size=n_dev, queue_axis_size=1))
    optimizer = optax.chain(optax.add_decayed_weights(1e-4), optax.sgd(0.03, momentum=0.9))

    note(backend_up=True, n_devices=len(jax.devices()))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = init_vince_state(jax.random.PRNGKey(0), cfg, optimizer)
    state = shard_state(state, mesh)
    compiler_options = None
    if os.environ.get("BENCH_XLA_FLAGS"):
        compiler_options = dict(
            kv.split("=", 1) for kv in os.environ["BENCH_XLA_FLAGS"].split(",") if kv
        )
    step_fn = make_train_step(cfg, optimizer, mesh, compiler_options=compiler_options)

    canvas = int(image / 0.875)
    rng = np.random.RandomState(0)
    host = rng.randint(0, 256, (batch, canvas, canvas, 3), np.uint8)
    batch_dev = (
        {
            "data": jax.device_put(host, jax.devices()[0]),
            "queue_data": jax.device_put(host[::-1].copy(), jax.devices()[0]),
        },
    )
    key = jax.random.PRNGKey(1)

    def fetch_loss(metrics):
        # NOTE: on the axon remote platform block_until_ready does not reliably
        # wait for chained executions; fetching a VALUE does (validated against
        # chained 4096³ matmuls hitting 184 TFLOPs bf16 ≈ 93% of v5e peak).
        return float(np.asarray(jax.device_get(metrics["loss/total_loss"])))

    # warmup / compile (2 calls: trace+compile, then steady-state graph)
    t0 = time.time()
    state, metrics = step_fn(state, batch_dev, key)
    loss = fetch_loss(metrics)
    compile_s = time.time() - t0
    note(compile_done=True, compile_s=round(compile_s, 1))
    state, metrics = step_fn(state, batch_dev, key)
    fetch_loss(metrics)

    # round-trip baseline: re-fetch an already-computed value
    t0 = time.time()
    for _ in range(3):
        fetch_loss(metrics)
    rt = (time.time() - t0) / 3

    t0 = time.time()
    for _ in range(steps):
        state, metrics = step_fn(state, batch_dev, key)
    loss = fetch_loss(metrics)  # forces the whole chain
    dt = max(time.time() - t0 - rt, 1e-9)
    note(steps_done=steps)

    fps = batch * steps / dt
    # sanity vs physics: frames/s must be below the chip's bf16 peak budget
    flops_per_frame = {
        "ResNet18": 4 * 3.6e9, "ResNet34": 4 * 7.3e9, "ResNet50": 4 * 8.2e9,
        # width-multiplied variants (tools/roofline_model.py ResNet50w{2,4}
        # fwd TFLOP / batch): the MXU positive-control configs
        "ResNet50w2": 4 * 35.2e9, "ResNet50w4": 4 * 139.9e9,
        "EfficientNetB0": 4 * 0.8e9,
    }.get(backbone, 4 * 8.2e9)
    peak_fps = 197e12 / flops_per_frame
    assert fps < peak_fps, f"non-physical timing: {fps:.0f} fps > peak {peak_fps:.0f}"
    assert np.isfinite(loss), "non-finite loss in bench step"
    mxu = fps * flops_per_frame / 197e12
    step_ms = dt / steps * 1000
    print(
        f"# bench: {backbone} b={batch} img={image} q={queue_size} "
        f"step={step_ms:.1f}ms compile={compile_s:.0f}s loss={loss:.3f} "
        f"~mxu_util={mxu:.2f}",
        file=sys.stderr,
    )
    return {"fps": fps, "step_ms": step_ms, "mxu_util": mxu,
            "compile_s": compile_s, "loss": loss}


def inner_main():
    """Child process: run the measured section and print one JSON line."""
    batch = int(os.environ.get("BENCH_BATCH", 128))
    steps = int(os.environ.get("BENCH_STEPS", 30))
    backbone = os.environ.get("BENCH_BACKBONE", "ResNet50")
    image = int(os.environ.get("BENCH_IMAGE", 224))
    queue_size = int(os.environ.get("BENCH_QUEUE", 65536))
    note = _progress_writer(os.environ.get("BENCH_PROGRESS_FILE", os.devnull))

    requested_batch = batch
    try:
        r = run_bench(batch, steps, backbone, image, queue_size, note)
    except Exception as e:
        # OOM fallback ONLY — anything else (shape bug, NaN loss, non-physical
        # timing assert) must fail loudly, not get laundered into a
        # half-batch "success"
        if "RESOURCE_EXHAUSTED" not in repr(e) and "out of memory" not in repr(e).lower():
            raise
        print(f"# bench OOM at b={batch}; retrying b={batch//2}", file=sys.stderr)
        batch //= 2
        r = run_bench(batch, steps, backbone, image, queue_size, note)

    result = {
        "metric": METRIC,
        "value": round(r["fps"], 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(r["fps"] / REFERENCE_BASELINE_FPS_PER_CHIP, 3),
        "step_ms": round(r["step_ms"], 2),
        "mxu_util": round(r["mxu_util"], 3),
        "compile_s": round(r["compile_s"], 1),
        "config": {
            "backbone": backbone, "batch": batch, "image": image,
            "queue_size": queue_size, "steps": steps,
            "fused_infonce": bool(int(os.environ.get("BENCH_FUSED", "0"))),
            "dtype": "bfloat16",
        },
    }
    if batch != requested_batch:
        result["batch"] = batch  # flag that the OOM fallback changed the config
    print(json.dumps(result))


def main():
    if os.environ.get("BENCH_INNER") == "1":
        inner_main()
        return

    # Observed tunnel wedges last tens of minutes to hours; the compute
    # budget only starts once the backend answers, so a long pre-flight wait
    # costs nothing when the tunnel is healthy.
    tunnel_wait = float(os.environ.get("BENCH_TUNNEL_WAIT", 2400))
    if not _wait_for_backend(tunnel_wait):
        _emit_error("JAX backend never initialized within BENCH_TUNNEL_WAIT "
                    "(TPU tunnel down)", {})
        sys.exit(17)

    timeout_s = float(os.environ.get("BENCH_TIMEOUT", 1500))
    retries = int(os.environ.get("BENCH_RETRIES", 1))
    with tempfile.NamedTemporaryFile(mode="w", suffix=".bench_progress",
                                     delete=False) as f:
        progress_path = f.name
    env = dict(os.environ, BENCH_INNER="1", BENCH_PROGRESS_FILE=progress_path)
    child_cmd = [sys.executable, os.path.abspath(__file__)]

    def probe():
        return _wait_for_backend(min(tunnel_wait, 600))

    n_runs = int(os.environ.get("BENCH_RUNS", 3))
    result, last_failed = run_median_of(
        child_cmd, timeout_s, retries, n_runs, progress_path, probe=probe,
        env=env,
    )
    try:
        os.unlink(progress_path)
    except OSError:
        pass
    if result is None:
        _emit_error(
            f"bench did not complete within {timeout_s:.0f}s/attempt "
            f"({n_runs} runs x {1 + retries} attempts; TPU tunnel wedge?)",
            (last_failed or {}).get("progress", {}),
        )
        sys.exit(17)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
