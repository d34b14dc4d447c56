#!/usr/bin/env python
"""Headline benchmark: VINCE ResNet50 pretrain step throughput (frames/sec/chip).

Measures the full jitted training step on the real TPU — on-device fused
augmentation + query fwd/bwd + momentum-encoder fwd + multi-pair InfoNCE
against the 65,536-entry queue + SGD + EMA + enqueue (the reference hot loop,
``vince_solver.py:386-518``, BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6). We
normalize against a documented estimate of the reference stack's per-GPU rate:
MoCo-style ResNet50 training at ~167 frames/sec per 2020-era datacenter GPU
(8-GPU host, MoCo's published 53h/200ep on ImageNet-1.28M ⇒ ~1340 img/s ÷ 8).
The reference's single-process DataParallel would be at or below this.

Env overrides: BENCH_BATCH (default 128), BENCH_STEPS (default 10),
BENCH_BACKBONE (ResNet50), BENCH_IMAGE (224), BENCH_QUEUE (65536),
BENCH_FUSED=1 (Pallas streaming InfoNCE kernel), BENCH_SE_KIND (mul|fold).
"""

import json
import os
import sys
import threading
import time

import numpy as np

REFERENCE_BASELINE_FPS_PER_CHIP = 167.0


def _start_watchdog(timeout_s: float) -> threading.Timer:
    """The axon tunnel can wedge (observed: jax.devices() blocking forever).
    A hung bench is worse than a failed one — emit a diagnostic JSON line and
    exit instead of hanging the driver. Normal runs (compile ~40 s + 10 steps)
    finish far inside the default; BENCH_TIMEOUT overrides."""

    def fire():
        print(json.dumps({
            "metric": "vince_pretrain_frames_per_sec_per_chip_rn50",
            "value": 0.0,
            "unit": "frames/s/chip",
            "vs_baseline": 0.0,
            "error": f"bench did not complete within {timeout_s:.0f}s "
                     "(TPU tunnel down or backend init hung)",
        }))
        sys.stdout.flush()
        os._exit(17)

    timer = threading.Timer(timeout_s, fire)
    timer.daemon = True
    timer.start()
    return timer


def _wait_for_backend(max_wait_s: float) -> bool:
    """The axon tunnel can wedge for stretches (observed: ``jax.devices()``
    blocking indefinitely in-process, unkillable from Python). Probe it in a
    killable subprocess and wait for recovery before spending the watchdog
    budget on a doomed run. Returns False if it never comes up."""
    import subprocess

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


def run_bench(batch: int, steps: int, backbone: str, image: int, queue_size: int):
    import jax
    import jax.numpy as jnp
    import optax

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

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = init_vince_state(jax.random.PRNGKey(0), cfg, optimizer)
    state = shard_state(state, mesh)
    step_fn = make_train_step(cfg, optimizer, mesh)

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

    fps = batch * steps / dt
    # sanity vs physics: frames/s must be below the chip's bf16 peak budget
    flops_per_frame = {
        "ResNet18": 4 * 3.6e9, "ResNet34": 4 * 7.3e9, "ResNet50": 4 * 8.2e9,
        "EfficientNetB0": 4 * 0.8e9,
    }.get(backbone, 4 * 8.2e9)
    peak_fps = 197e12 / flops_per_frame
    assert fps < peak_fps, f"non-physical timing: {fps:.0f} fps > peak {peak_fps:.0f}"
    assert np.isfinite(loss), "non-finite loss in bench step"
    mxu = fps * flops_per_frame / 197e12
    print(
        f"# bench: {backbone} b={batch} img={image} q={queue_size} "
        f"step={dt/steps*1000:.1f}ms compile={compile_s:.0f}s loss={loss:.3f} "
        f"~mxu_util={mxu:.2f}",
        file=sys.stderr,
    )
    return fps


def main():
    batch = int(os.environ.get("BENCH_BATCH", 128))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    backbone = os.environ.get("BENCH_BACKBONE", "ResNet50")
    image = int(os.environ.get("BENCH_IMAGE", 224))
    queue_size = int(os.environ.get("BENCH_QUEUE", 65536))

    # Observed tunnel wedges last tens of minutes to hours; the compute
    # watchdog (BENCH_TIMEOUT) only starts once the backend answers, so a
    # long pre-flight wait costs nothing when the tunnel is healthy.
    if not _wait_for_backend(float(os.environ.get("BENCH_TUNNEL_WAIT", 2400))):
        print(json.dumps({
            "metric": "vince_pretrain_frames_per_sec_per_chip_rn50",
            "value": 0.0,
            "unit": "frames/s/chip",
            "vs_baseline": 0.0,
            "error": "JAX backend never initialized within BENCH_TUNNEL_WAIT "
                     "(TPU tunnel down)",
        }))
        sys.exit(17)

    watchdog = _start_watchdog(float(os.environ.get("BENCH_TIMEOUT", 1500)))

    requested_batch = batch
    try:
        fps = run_bench(batch, steps, backbone, image, queue_size)
    except Exception as e:
        # OOM fallback ONLY — anything else (shape bug, NaN loss, non-physical
        # timing assert) must fail loudly, not get laundered into a
        # half-batch "success"
        if "RESOURCE_EXHAUSTED" not in repr(e) and "out of memory" not in repr(e).lower():
            raise
        print(f"# bench OOM at b={batch}; retrying b={batch//2}", file=sys.stderr)
        batch //= 2
        fps = run_bench(batch, steps, backbone, image, queue_size)
    watchdog.cancel()

    result = {
        "metric": "vince_pretrain_frames_per_sec_per_chip_rn50",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / REFERENCE_BASELINE_FPS_PER_CHIP, 3),
    }
    if batch != requested_batch:
        result["batch"] = batch  # flag that the OOM fallback changed the config
    print(json.dumps(result))


if __name__ == "__main__":
    main()
