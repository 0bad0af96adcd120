"""Benchmark: Kodak-size (768x512) enc+dec throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline is the repo north-star (BASELINE.json): >= 20 Kodak 768x512
images/sec/chip enc+dec on TPU v5e.  The reference publishes no wall-clock
numbers (BASELINE.md), so vs_baseline is measured against that target.

Runs on whatever accelerator jax exposes (the driver provides one real TPU
chip); uses synthetic Kodak-shaped images (no dataset egress in this env).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    if os.environ.get("BENCH_CPU", "0") == "1":
        # the axon TPU plugin overrides JAX_PLATFORMS; force via config
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mlic_tpu.codec import Codec
    from mlic_tpu.data.folder import synthetic_batches
    from mlic_tpu.models.registry import get_model

    verbose = os.environ.get("BENCH_VERBOSE", "0") == "1"

    def vlog(*a):
        if verbose:
            print(*a, file=sys.stderr, flush=True)

    model_name = os.environ.get("BENCH_MODEL", "MLICPP_S")
    n_batches = int(os.environ.get("BENCH_IMAGES", "8"))
    # batch 128 default: the pipeline's per-batch costs are sync/RTT-bound
    # (same-window scaling 16/32/64/128 -> 2.94/5.50/7.19/8.58 img/s), so
    # serving throughput wants large batches; BENCH_BATCH=8 restores the
    # r1/r2 regime for comparisons.
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    backend = os.environ.get("BENCH_BACKEND", "device")
    n_lanes = int(os.environ.get("BENCH_LANES", "512"))
    content = os.environ.get("BENCH_CONTENT", "dead_leaves")
    h, w = 512, 768  # Kodak portrait/landscape canonical size

    model = get_model(model_name)
    if os.environ.get("BENCH_BF16", "1") == "1":
        import dataclasses
        tdt = os.environ.get("BENCH_TDT", "bfloat16")
        model = type(model)(cfg=dataclasses.replace(
            model.cfg, transform_dtype=tdt))
    rng = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    # init at the coding size so no extra compile of g_a at another shape
    x0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    t = time.perf_counter()
    params = jax.jit(lambda r, v: model.init(r, v, True))(rng, x0)["params"]
    jax.block_until_ready(params)
    vlog(f"init: {time.perf_counter()-t:.1f}s")

    # Trained weights if available: BENCH_CKPT env, else the repo's default
    # bench checkpoint (escape-heavy random-init streams are ~10x the rate
    # of trained ones and unrepresentative of deployment).
    # The repo default checkpoint holds MLICPP_S weights; load_matching is
    # shape-filtered, so pointing it at another model would silently load
    # nothing and mislabel a random-init run as trained.
    default_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "ckpts", "bench_default")
    ckpt = os.environ.get("BENCH_CKPT",
                          default_ckpt if os.path.isdir(default_ckpt)
                          and model_name == "MLICPP_S" else "")
    if ckpt:
        import orbax.checkpoint as ocp

        from mlic_tpu.utils.checkpoint import load_matching
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
        params = load_matching(params, raw.get("params", raw))
        vlog(f"loaded checkpoint {ckpt}")

    # Encode-side g_s synthesis off by default: serving delivers bitstreams
    # (the reference's compress never synthesizes either); BENCH_ENC_RECON=1
    # restores the encoder-side reconstruction.
    enc_recon = os.environ.get("BENCH_ENC_RECON", "0") == "1"
    codec = Codec(model, params, backend=backend, n_lanes=n_lanes,
                  encode_recon=enc_recon)
    t = time.perf_counter()
    codec.update()
    vlog(f"update: {time.perf_counter()-t:.1f}s")

    images = []
    if content == "dead_leaves":
        # Non-tiled full-frame dead-leaves content (scale-invariant disk
        # occlusions): no periodic structure for the context models to
        # exploit, unlike the r1/r2 tiled-patch frames.  Rendered once and
        # cached on disk (MLIC_POOL_CACHE).
        from mlic_tpu.data.folder import dead_leaves_pool
        n_frames = min((n_batches + 1) * batch, 24)
        pool = dead_leaves_pool(n_frames, h, seed=1303, width=w)
        for k in range(n_batches + 1):
            idx = [(k * batch + i) % n_frames for i in range(batch)]
            images.append(pool[idx])
    else:
        gen = synthetic_batches(batch, 64, steps=n_batches + 1, seed=7)
        for b in gen:
            # synthetic_batches yields square patches; tile to Kodak shape.
            # uint8 host-side, like a real image pipeline (1 byte/chan
            # upload).
            img = np.tile(b, (1, h // 64 + 1, w // 64 + 1, 1))[:, :h, :w, :]
            images.append(np.round(img * 255).astype(np.uint8))

    # BENCH_STAGED=1: pre-stage every input batch on the device before the
    # clock starts — the reference's cost_time semantics (its compress is
    # timed with the tensor already on the GPU, mlicpp.py:199-201).  The
    # default (0) counts the host->device image upload too, which through
    # the dev tunnel (1.5-60 MB/s, weather-dependent) dominates and
    # measures the link, not the codec.
    staged = os.environ.get("BENCH_STAGED", "0") == "1"
    if staged:
        dev = jax.devices()[0]
        images = [jax.device_put(im, dev) for im in images]
        jax.block_until_ready(images)

    # Warmup: compile encode+decode paths.
    t = time.perf_counter()
    enc = codec.compress(images[0])
    vlog(f"compress warmup: {time.perf_counter()-t:.1f}s")
    t = time.perf_counter()
    dec = codec.decompress(enc["strings"], enc["shape"])
    jax.block_until_ready(dec["x_hat"])
    vlog(f"decompress warmup: {time.perf_counter()-t:.1f}s")

    # BENCH_PIPELINE (default on): two-deep software pipeline
    # (compress_begin/end split) — overlaps host stream-assembly/z-coding/
    # transfers of batch i with device compute of batch i+1, as a serving
    # pipeline would.  All work is still counted; the clock stops after
    # the last checksum.
    pipeline = os.environ.get("BENCH_PIPELINE", "1") == "1"
    # Per-batch timing: the dev-tunnel TPU is SHARED — co-tenant HBM
    # traffic was measured stretching these (HBM-bound) programs 5-6x
    # while MXU-resident matmul probes stayed fast.  Report the median
    # batch rate as the value and best/worst in extra so one contended
    # window doesn't masquerade as codec capability (or vice versa).
    total_bits = 0
    n = n_batches * batch
    bpp = 0.0
    extra = {}

    def pipeline_run(imgs):
        # Two-deep software pipeline over the begin/end split: the device
        # executes programs back-to-back in dispatch order while the host
        # overlaps its stream downloads / z coding / parsing of batch i
        # with the device compute of batch i+1.  All work is counted — the
        # clock stops only after every x_hat checksum is fetched.
        bits = 0
        t0 = time.perf_counter()
        h_enc = codec.compress_begin(imgs[0])
        dec_pending = None  # (dec dict) awaiting checksum
        for k in range(len(imgs)):
            nxt = codec.compress_begin(imgs[k + 1]) if k + 1 < len(imgs) \
                else None
            enc = codec.compress_end(h_enc)
            bits += 8 * sum(len(s) for g in enc["strings"] for s in g)
            dec = codec.decompress(enc["strings"], enc["shape"], wait=False)
            if dec_pending is not None:
                checksum = float(jnp.sum(dec_pending["x_hat"]))
                assert np.isfinite(checksum)
            dec_pending = dec
            h_enc = nxt
        checksum = float(jnp.sum(dec_pending["x_hat"]))
        assert np.isfinite(checksum)
        return time.perf_counter() - t0, bits

    if pipeline and backend == "device":
        elapsed, total_bits = pipeline_run(images[1:n_batches + 1])
        imgs_per_sec = n / elapsed
        bpp = total_bits / (n * h * w)
        extra["aggregation"] = "pipelined_aggregate"
        if not staged and os.environ.get("BENCH_STAGED_PROBE", "1") == "1":
            # Device-resident-input probe: the reference's cost_time
            # semantics (its compress is timed with the tensor already on
            # the GPU, mlicpp.py:199-201).  The main number above counts
            # the host->device image upload through the dev tunnel
            # (1.5-60 MB/s weather), which a production-attached TPU would
            # not pay; this probe isolates codec capability from the link.
            # Inputs are staged cheaply by uploading the frame pool once
            # and gathering batches on-device.
            try:
                dev = jax.devices()[0]
                if content == "dead_leaves":
                    pool_dev = jax.device_put(np.asarray(pool), dev)
                    st_imgs = [pool_dev[jnp.asarray(
                        [(k * batch + i) % len(pool) for i in range(batch)])]
                        for k in range(3)]
                else:
                    st_imgs = [jax.device_put(images[k], dev)
                               for k in range(3)]
                jax.block_until_ready(st_imgs)
                # Cycle the 3 staged batches for the full batch count so the
                # un-overlapped pipeline ramp/drain (one decode ~5 s at batch
                # 128) amortizes like the headline number — a 3-batch probe
                # understated staged throughput ~2.5x (4.7 vs 12.6 img/s in
                # a same-window A/B).
                st_seq = [st_imgs[k % 3] for k in range(n_batches)]
                st_elapsed, _ = pipeline_run(st_seq)
                extra["staged_img_s"] = round(n / st_elapsed, 4)
            except Exception as e:  # the probe must never sink the bench
                extra["staged_probe_error"] = repr(e)[:200]
        # Sequential one-batch probe for the enc/dec split (the reference
        # times encode and decode separately, utils/testing.py:403-424; in
        # the pipeline they overlap, so the split is measured unpipelined).
        tb = time.perf_counter()
        enc = codec.compress(images[0])
        te = time.perf_counter()
        dec = codec.decompress(enc["strings"], enc["shape"])
        checksum = float(jnp.sum(dec["x_hat"]))
        assert np.isfinite(checksum)
        td = time.perf_counter()
        extra["enc_img_s"] = round(batch / (te - tb), 4)
        extra["dec_img_s"] = round(batch / (td - te), 4)
        extra["split"] = "sequential_probe_batch"
    else:
        batch_times = []
        enc_times = []
        dec_times = []
        t0 = time.perf_counter()
        for k in range(1, n_batches + 1):
            tb = time.perf_counter()
            img = images[k]
            enc = codec.compress(img)
            total_bits += 8 * sum(len(s) for group in enc["strings"]
                                  for s in group)
            # compress() is fenced by construction: the returned strings
            # are host bytes assembled from real device downloads.
            te = time.perf_counter()
            dec = codec.decompress(enc["strings"], enc["shape"])
            # The axon runtime can defer execution of programs whose
            # outputs are never fetched — block_until_ready alone returned
            # in ~0.2 ms for a 43 ms program in one measured phase.  A
            # scalar download is the only trustworthy fence: it forces the
            # decode pass to have actually run (and costs one ~30 ms round
            # trip, honestly part of delivering pixels).
            checksum = float(jnp.sum(dec["x_hat"]))
            assert np.isfinite(checksum)
            td = time.perf_counter()
            enc_times.append(te - tb)
            dec_times.append(td - te)
            batch_times.append(td - tb)
        elapsed = time.perf_counter() - t0
        bt = sorted(batch_times)
        imgs_per_sec = batch / bt[len(bt) // 2]
        bpp = total_bits / (n * h * w)
        med = lambda ts: sorted(ts)[len(ts) // 2]
        extra.update({
            "aggregation": "median_batch",
            "enc_img_s": round(batch / med(enc_times), 4),
            "dec_img_s": round(batch / med(dec_times), 4),
            "best": round(batch / bt[0], 4),
            "worst": round(batch / bt[-1], 4),
            "mean": round(n / elapsed, 4)})

    result = {
        "metric": f"kodak_768x512_encdec_images_per_sec_per_chip[{model_name}]",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / 20.0, 4),
        "extra": {("bpp" if ckpt else "bpp_random_init"): round(bpp, 4),
                  "n_images": n, "batch": batch, "backend": backend,
                  "ckpt": bool(ckpt), "device": str(jax.devices()[0]),
                  "content": content, "fenced": True, "staged": staged,
                  **extra},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
