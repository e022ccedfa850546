#!/usr/bin/env python
"""Benchmark harness (SURVEY.md §4.6, §6; BASELINE.md configs).

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric = BASELINE north star: fused 2D-infer + SMPL-fit
frames/sec/chip (target ≥500 on TPU v5e → vs_baseline = value/500).
Per-config details go to stderr (--all to run every BASELINE config).

IMPORTANT timing note: under the axon TPU platform jax.block_until_ready
is a NO-OP (verified); every measurement here forces a real sync via a
scalar device_get.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=5, warmup=2):
    """Fenced mean seconds/call — tpu_pose.utils.profiling.Timer (which
    owns the axon block_until_ready workaround)."""
    from tpu_pose.utils.profiling import Timer
    return Timer(fn, *args, warmup=warmup, iters=iters).run()


def enable_compilation_cache():
    """Persistent XLA compilation cache: the fused fit program takes
    minutes to compile; caching makes repeat bench runs start hot."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        log(f"compilation cache unavailable: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small batch / fewer timing iters (smoke test)")
    ap.add_argument("--all", action="store_true",
                    help="also run BASELINE configs 1,3,4 to stderr")
    ap.add_argument("--batch", type=int, default=0,
                    help="override fused-path batch size")
    ap.add_argument("--trace", default="",
                    help="write a jax.profiler trace of one fused batch "
                         "to this directory (Perfetto/TensorBoard)")
    ap.add_argument("--no-int8", action="store_true",
                    help="disable the calibrated-int8 CPM serving path "
                         "(accuracy-gated in tests/test_quantize.py) and "
                         "run bf16")
    ap.add_argument("--microbatch", type=int, default=64,
                    help="CPM micro-chunk for batches past the whole-batch "
                         "int32-activation OOM ceiling (b>=192 on 16 GB); "
                         "0 disables the big-batch configs")
    args = ap.parse_args()

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tpu_pose.api import PoseEstimator

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    rng = np.random.RandomState(0)

    def images(b):
        return jnp.asarray(rng.randint(0, 255, (b, 368, 368, 3)), jnp.uint8)

    if args.no_int8:
        est = PoseEstimator.create_synthetic(seed=0)
    else:
        # Serving config: calibrated-int8 CPM (models/cpm.py) — ~1.3×
        # over bf16 on v5e; joint-drift accuracy gated by
        # tests/test_quantize.py. Static activation scales let XLA fuse
        # the quantize→conv→dequant chain with no reduction barriers.
        est = PoseEstimator.create_synthetic(
            seed=0, quantize=True, calibration_images=images(4))

    titers = 2 if args.quick else 5

    # ---- headline: fused estimate_and_fit frames/sec/chip --------------
    # (int8 path: batch ≤128 — the int32 conv1 buffer OOMs 16 GB HBM at
    # b=256; bf16 scales to 256 but peaks lower.)
    if args.batch:
        batches = [args.batch]
    elif args.quick:
        batches = [32]
    else:
        batches = [64, 128]
    best_fps, best_b = 0.0, 0
    for b in batches:
        imgs = images(b)
        dt = timeit(est.estimate_and_fit, imgs, iters=titers, warmup=1)
        fps = b / dt
        log(f"fused estimate_and_fit b={b}: {dt*1e3:.1f} ms -> "
            f"{fps:.1f} frames/s/chip")
        if fps > best_fps:
            best_fps, best_b = fps, b

    # Past the whole-batch ceiling: micro-chunked CPM (api.py
    # cpm_microbatch) keeps the int32 trunk activations per-chunk, so
    # b=192/256 fit 16 GB. Shares the already-calibrated params.
    if args.microbatch and not args.quick and not args.batch \
            and not args.no_int8:
        from tpu_pose.api import PoseEstimator as PE
        est_big = PE(est.cpm_params, est.smpl_model, est.prior,
                     est.cpm_cfg, est.fit_cfg,
                     cpm_microbatch=args.microbatch)
        for b in (192, 256):
            imgs = images(b)
            try:
                dt = timeit(est_big.estimate_and_fit, imgs,
                            iters=max(1, titers - 2), warmup=1)
            except Exception as e:
                log(f"fused b={b} microbatch={args.microbatch}: "
                    f"failed ({type(e).__name__})")
                continue
            fps = b / dt
            log(f"fused b={b} microbatch={args.microbatch}: "
                f"{dt*1e3:.1f} ms -> {fps:.1f} frames/s/chip")
            if fps > best_fps:
                best_fps, best_b = fps, b

    # ---- auxiliary configs (stderr only) --------------------------------
    if args.all:
        # Config 1: batch-1 2D inference LATENCY. The batch-conditional
        # precision policy (api.py int8_min_batch) routes b=1 to the bf16
        # weights automatically — same estimator as the throughput runs.
        dt = timeit(est.estimate_2d, images(1), iters=titers)
        log(f"config1 CPM b=1 (policy → "
            f"{'bf16' if est.cpm_params_bf16 is not None or args.no_int8 else 'int8'}): "
            f"{dt*1e3:.2f} ms/frame")
        # Config 2: batch-32 2D inference + decode.
        dt = timeit(est.estimate_2d, images(32), iters=titers)
        log(f"config2 CPM b=32: {dt*1e3:.1f} ms -> {32/dt:.1f} fps")
        # Config 3: single-frame fit.
        j = jnp.asarray(rng.rand(14, 2) * 368, jnp.float32)
        c = jnp.ones(14)
        dt = timeit(est.fit_smpl, j, c, iters=titers)
        iters_total = sum(s.iters for s in est.fit_cfg.stages)
        log(f"config3 single fit: {dt*1e3:.1f} ms "
            f"({iters_total/dt:.0f} fit-iters/s)")
        # Config 4: 64-frame video with temporal init.
        from tpu_pose.fitting import temporal
        jseq = jnp.asarray(rng.rand(64, 14, 2) * 368, jnp.float32)
        cseq = jnp.ones((64, 14))
        vid = jax.jit(lambda a, b_: temporal.fit_video(
            est.smpl_model, a, b_, cfg=est.fit_cfg, prior=est.prior))
        dt = timeit(vid, jseq, cseq, iters=max(1, titers - 2), warmup=1)
        log(f"config4 video-64 temporal fit: {dt*1e3:.0f} ms -> "
            f"{64/dt:.1f} frames/s")
        # Accuracy-frontier variant: joint whole-sequence smooth fit
        # (hypothesis lattice + Viterbi + coupled refine; temporal.py).
        vid_s = jax.jit(lambda a, b_: temporal.fit_video_smooth(
            est.smpl_model, a, b_, cfg=est.fit_cfg, prior=est.prior))
        dt = timeit(vid_s, jseq, cseq, iters=max(1, titers - 2), warmup=1)
        log(f"config4 video-64 smooth joint fit: {dt*1e3:.0f} ms -> "
            f"{64/dt:.1f} frames/s")
        # Config 5: dataset-scale streaming eval (H3.6M-style protocol
        # suite over the fused pipeline — parallel/eval.py), single chip.
        # Includes metric accumulation + host-side Procrustes, i.e. the
        # real end-to-end eval rate, not just the device program.
        from tpu_pose.data import synthetic as synth
        from tpu_pose.parallel import eval as eval_lib
        ev_b, ev_n = (128, 3) if not args.quick else (32, 2)
        ev_batches = list(synth.eval_batches(
            est.smpl_model, ev_b, ev_n, est.cpm_cfg, seed=77))
        import time as _time
        eval_lib.evaluate_h36m_style(est, iter(ev_batches[:1]))  # warm
        t0 = _time.perf_counter()
        ev = eval_lib.evaluate_h36m_style(est, iter(ev_batches))
        dt = _time.perf_counter() - t0
        log(f"config5 streaming eval {ev_b * ev_n} frames: {dt:.2f} s -> "
            f"{ev_b * ev_n / dt:.1f} frames/s "
            f"(pa_mpjpe {ev['pa_mpjpe'] * 1e3:.1f} mm on random weights)")
        # Config 6: open-loop serving load test (tpu_pose/serving.py) —
        # mixed-RESOLUTION single-frame requests through the batching
        # server (submit-time letterbox, 1-deep pipelined dispatch,
        # trimmed response fields). One bucket so exactly one program
        # compiles; measures the end-to-end request rate including host
        # preprocessing and the device↔host transfers.
        from tpu_pose import serving as serving_lib
        n_req = 64 if args.quick else 256
        # (a) Engine rate: same-resolution requests (no submit-side
        # letterbox cost) — measures the dispatch/pipeline/transfer
        # machinery itself, comparable to the r2 serialized-dispatch
        # figure.
        same = [rng.randint(0, 255, (368, 368, 3)).astype(np.uint8)
                for _ in range(n_req)]
        with serving_lib.BatchingServer(
                est, max_batch=64, max_wait_ms=5.0, buckets=(64,),
                fields=("theta", "beta", "cam", "joints2d",
                        "conf")) as srv:
            for f in [srv.submit(fr) for fr in same[:64]]:
                f.result()  # warm: compile the bucket program
            t0 = _time.perf_counter()
            for f in [srv.submit(fr) for fr in same]:
                f.result()
            dt = _time.perf_counter() - t0
            snap = srv.stats.snapshot()
        log(f"config6a serving open-loop {n_req} same-res reqs: "
            f"{dt:.2f} s -> {n_req / dt:.1f} req/s "
            f"(mean batch {snap['mean_batch']:.1f}, occupancy "
            f"{snap['occupancy']:.2f})")
        # (b) Mixed-resolution traffic from concurrent clients: submit-
        # side letterbox runs on the CLIENT threads. On this 1-CPU-core
        # host the preprocessing serializes (~25 ms/frame) and bounds
        # the rate; on a real multi-core serving host it parallelizes
        # across clients.
        from concurrent.futures import ThreadPoolExecutor
        shapes = [(368, 368), (480, 640), (720, 540)]
        mixed = [rng.randint(0, 255, shapes[i % 3] + (3,))
                 .astype(np.uint8) for i in range(n_req)]
        with serving_lib.BatchingServer(
                est, max_batch=64, max_wait_ms=5.0, buckets=(64,),
                fields=("theta", "beta", "cam", "joints2d",
                        "conf")) as srv, \
                ThreadPoolExecutor(max_workers=4) as pool:
            for f in list(pool.map(srv.submit, mixed[:64])):
                f.result()
            t0 = _time.perf_counter()
            for f in list(pool.map(srv.submit, mixed)):
                f.result()
            dt = _time.perf_counter() - t0
            snap = srv.stats.snapshot()
        log(f"config6b serving open-loop {n_req} mixed-res reqs "
            f"(4 client threads): {dt:.2f} s -> {n_req / dt:.1f} req/s "
            f"(mean batch {snap['mean_batch']:.1f}, occupancy "
            f"{snap['occupancy']:.2f})")
        # (c) The same load THROUGH the HTTP data plane (serving_http),
        # driven by the PRODUCT client (tpu_pose.client.PoseClient:
        # keep-alive HTTP/1.1 connection per thread, binary npz
        # responses): quantifies the socket + npy-decode + npz-encode
        # tax over the in-process 6a figure. 64 sync client threads so
        # the offered load saturates the bucket like 6a's up-front
        # submits — with few closed-loop clients the comparison
        # conflates the HTTP tax with batching policy (4 threads
        # measured 3.4 req/s: every ~4-deep batch pads to 64 and ships
        # the full 26 MB padded upload over the ~41 MB/s tunnel).
        from tpu_pose.client import PoseClient
        from tpu_pose.serving_http import PoseHTTPServer

        with PoseHTTPServer(est, max_batch=64, max_wait_ms=5.0,
                            buckets=(64,),
                            fields=("theta", "joints2d",
                                    "conf")) as hsrv, \
                ThreadPoolExecutor(max_workers=64) as pool, \
                PoseClient(f"http://{hsrv.host}:{hsrv.port}",
                           fields=("theta", "joints2d", "conf")) as cli:
            list(pool.map(cli.predict, same[:64]))          # warm
            t0 = _time.perf_counter()
            list(pool.map(cli.predict, same))
            dt = _time.perf_counter() - t0
            snap = hsrv.server.stats.snapshot()
        log(f"config6c HTTP serving open-loop {n_req} same-res reqs "
            f"(64 keep-alive client threads): {dt:.2f} s -> "
            f"{n_req / dt:.1f} req/s (mean batch {snap['mean_batch']:.1f})")

        # (d) OVERLOAD posture (VERDICT r3 next #4): offered load far
        # beyond capacity against a bounded queue — sheds must be
        # PROMPT typed 503-style rejections (microseconds, measured),
        # memory stays bounded at max_queue, and every ACCEPTED request
        # completes. 8 submit threads fire n_over requests at once.
        n_over = 256 if args.quick else 512
        shed_times, accepted = [], []
        with serving_lib.BatchingServer(
                est, max_batch=64, max_wait_ms=5.0, buckets=(64,),
                max_queue=96,
                fields=("theta",)) as srv:
            for f in [srv.submit(fr) for fr in same[:64]]:
                f.result()                        # warm program
            import threading as _threading
            lock = _threading.Lock()

            def fire(fr):
                t1 = _time.perf_counter()
                try:
                    fut = srv.submit(fr)
                except serving_lib.ServerOverloaded:
                    with lock:
                        shed_times.append(_time.perf_counter() - t1)
                    return None
                with lock:
                    accepted.append(fut)
                return fut

            t0 = _time.perf_counter()
            with ThreadPoolExecutor(max_workers=8) as pool:
                list(pool.map(fire, [same[i % len(same)]
                                     for i in range(n_over)]))
            for f in accepted:
                f.result()
            dt = _time.perf_counter() - t0
            depth_after = srv.queue_depth()
            shed_total = srv.telemetry()["shed"]
        shed_ms = (sorted(shed_times)[len(shed_times) // 2] * 1e3
                   if shed_times else 0.0)
        log(f"config6d serving overload {n_over} offered vs max_queue "
            f"96: accepted {len(accepted)}, shed {shed_total} "
            f"(p50 shed latency {shed_ms:.3f} ms), all accepted "
            f"completed in {dt:.2f} s -> "
            f"{len(accepted) / dt:.1f} req/s, queue drained to "
            f"{depth_after}")

        # Config 7: ACCURACY-mode fused throughput — the configuration
        # the hard-benchmark accuracy table recommends (refine_center +
        # flip TTA + 2-scale TTA ≈ 6 CPM passes/frame). Quantifies what
        # the accuracy levers cost in frames/s next to the headline.
        est_acc = PoseEstimator(
            est.cpm_params, est.smpl_model, est.prior, est.cpm_cfg,
            est.fit_cfg, refine_center=True, flip_tta=True,
            scale_tta=(0.8, 1.25))
        b_acc = 32 if args.quick else 64
        dt = timeit(est_acc.estimate_and_fit, images(b_acc),
                    iters=max(1, titers - 2), warmup=1)
        log(f"config7 accuracy-mode fused b={b_acc} (rc+flip+2-scale "
            f"TTA): {dt*1e3:.0f} ms -> {b_acc/dt:.1f} frames/s")

        # share_trunk training-from-scratch layout (non-reference arch;
        # informational — the headline stays on the reference layout).
        from tpu_pose.utils.config import CPMConfig
        est_st = PoseEstimator.create_synthetic(
            seed=0, cpm_cfg=CPMConfig(share_trunk=True),
            quantize=not args.no_int8,
            calibration_images=None if args.no_int8 else images(4))
        dt = timeit(est_st.estimate_and_fit, images(best_b or 128),
                    iters=max(1, titers - 2), warmup=1)
        log(f"share_trunk fused b={best_b or 128}: {dt*1e3:.0f} ms -> "
            f"{(best_b or 128)/dt:.1f} frames/s")

    if args.trace:
        from tpu_pose.utils import profiling
        with profiling.trace(args.trace):
            profiling.sync(est.estimate_and_fit(images(best_b or 32)))
        log(f"profiler trace written to {args.trace}")

    mode = "bf16" if args.no_int8 else "int8-calibrated"
    result = {
        "metric": "fused_2d_infer_smpl_fit_throughput",
        "value": round(best_fps, 2),
        "unit": f"frames/sec/chip (batch={best_b}, {mode})",
        "vs_baseline": round(best_fps / 500.0, 4),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
