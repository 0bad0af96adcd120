"""Benchmark: Kodak-size (768x512) enc+dec throughput per chip.

Prints ONE OR MORE JSON lines of the form
{"metric", "value", "unit", "vs_baseline", "extra"} — the LAST line is the
authoritative result (the driver takes the last parsed line).  Baseline is
the repo north-star (BASELINE.json): >= 20 Kodak 768x512 images/sec/chip
enc+dec on TPU v5e.  The reference publishes no wall-clock numbers
(BASELINE.md), so vs_baseline is measured against that target.

Failure envelope (r5, after the r4 driver run timed out with NOTHING
captured — BENCH_r04.json rc=124 parsed=null):

* the HEADLINE staged line is emitted IMMEDIATELY after the staged probe
  and flushed — everything after it (enc/dec split, tunnel-inclusive
  pipelined phase) only ever *adds* a superseding line with more fields;
* a global deadline (``BENCH_DEADLINE`` seconds, default 900) gates every
  later phase: past it, remaining phases are skipped and whatever exists
  is printed;
* SIGTERM (what ``timeout`` sends) and normal interpreter exit both fall
  back to printing a labeled partial line instead of dying silent;
* before touching jax device state, a subprocess probe (``timeout``-
  guarded ``jax.devices()``) detects the documented axon tunnel-outage
  mode (hangs forever, ~0% CPU — CLAUDE.md); on probe failure a
  ``tunnel_down`` line is emitted instead of hanging past the driver
  budget.

Two regimes, both measured when time allows (declared in BASELINE.md):

* **staged** (the HEADLINE ``value``): input batches resident on device
  before the clock starts — the reference's ``cost_time`` semantics
  (``MLIC++/models/mlicpp.py:199-201``: compress is timed with the tensor
  already on the GPU).  This is codec capability, judged against the
  20 img/s target.  Measured as the median of >= 3 segments over >= 8
  distinct pre-staged batches, with MXU/HBM/RTT co-probes recorded before
  and after so contended captures are identifiable post-hoc (the dev-tunnel
  chip is multi-tenant; co-tenant HBM traffic stretches these HBM-bound
  programs 5-6x in phases while MXU-resident matmuls stay fast).
* **pipelined** (``extra.pipelined_img_s``): end-to-end including the
  host->device image upload through the dev tunnel (1.5-60 MB/s weather) —
  this environment's deliverable rate, not codec capability.

Set ``BENCH_OUT=path.json`` to also append every emitted line to a file
(committed under results/ as machine-readable evidence for PARITY rows).

Runs on whatever accelerator jax exposes (the driver provides one real TPU
chip); uses synthetic Kodak-shaped images (no dataset egress in this env).
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_T0 = time.perf_counter()
_DEADLINE = float(os.environ.get("BENCH_DEADLINE", "900"))

# Mutable measurement state shared with the fallback emitters.  ``value``
# holds the best headline-quality number measured so far; ``extra`` grows
# as phases complete; ``emitted`` counts printed JSON lines.
_STATE = {
    "value": None,
    "regime": None,
    "model": os.environ.get("BENCH_MODEL", "MLICPP_S"),
    "extra": {},
    "emitted": 0,
}


def _tleft() -> float:
    return _DEADLINE - (time.perf_counter() - _T0)


def _emit(value, regime, unit="img/s"):
    """Print one self-contained result line and flush (and mirror to
    BENCH_OUT if set).  Safe to call multiple times; the last line wins."""
    extra = dict(_STATE["extra"])
    extra["regime"] = regime
    extra["elapsed_s"] = round(time.perf_counter() - _T0, 1)
    result = {
        "metric": (f"kodak_768x512_encdec_images_per_sec_per_chip"
                   f"[{_STATE['model']}]"),
        "value": round(float(value), 4),
        "unit": unit,
        "vs_baseline": round(float(value) / 20.0, 4),
        "extra": extra,
    }
    line = json.dumps(result)
    print(line, flush=True)
    out = os.environ.get("BENCH_OUT", "")
    if out:
        try:
            with open(out, "a") as f:
                f.write(line + "\n")
        except OSError:
            pass
    _STATE["emitted"] += 1
    _STATE["value"] = float(value)
    _STATE["regime"] = regime


def _emit_fallback(reason: str):
    """Last-resort line: whatever was measured, labeled as partial."""
    if _STATE["value"] is not None and _STATE["emitted"] == 0:
        _STATE["extra"]["partial_reason"] = reason
        _emit(_STATE["value"], f"partial_{_STATE['regime'] or 'unknown'}")
    elif _STATE["emitted"] == 0:
        _STATE["extra"]["partial_reason"] = reason
        _emit(0.0, "no_measurement")


def _install_guards():
    import atexit

    def on_term(signum, frame):  # `timeout` sends SIGTERM before SIGKILL
        _emit_fallback(f"signal_{signum}")
        os._exit(1)

    signal.signal(signal.SIGTERM, on_term)
    atexit.register(lambda: _emit_fallback("exit_before_emit"))


def _tunnel_probe() -> bool:
    """Run ``jax.devices()`` in a throwaway subprocess under a timeout.

    The axon tunnel has documented outage windows during which even device
    enumeration hangs forever at ~0% CPU (CLAUDE.md); a hung main process
    records nothing.  The subprocess initializes and releases the device
    client before this process touches jax device state."""
    import subprocess
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "180"))
    code = ("import jax; d = jax.devices(); "
            "print(d[0].platform, len(d))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=probe_timeout, capture_output=True,
                           text=True)
        if r.returncode == 0:
            _STATE["extra"]["tunnel_probe"] = r.stdout.strip()[:40]
            return True
        _STATE["extra"]["tunnel_probe_rc"] = r.returncode
        _STATE["extra"]["tunnel_probe_err"] = r.stderr.strip()[-200:]
        return False
    except subprocess.TimeoutExpired:
        _STATE["extra"]["tunnel_probe_err"] = (
            f"timeout after {probe_timeout:.0f}s (axon outage pattern)")
        return False


def main():
    _install_guards()

    bench_cpu = os.environ.get("BENCH_CPU", "0") == "1"
    if not bench_cpu and os.environ.get("BENCH_TUNNEL_PROBE", "1") == "1":
        if not _tunnel_probe():
            _emit(0.0, "tunnel_down")
            return

    import jax
    if bench_cpu:
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

    model_name = _STATE["model"]
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

    # Trained weights: BENCH_CKPT env, else the per-model default bench
    # checkpoint ckpts/bench_default_<MODEL> (ckpts/bench_default is the
    # historical MLICPP_S one).  Random-init weights produce escape-heavy
    # streams ~10x the trained rate — unrepresentative of deployment — so
    # a model with NO trained checkpoint REFUSES to bench (before paying
    # the multi-minute init) unless BENCH_ALLOW_RANDOM=1 explicitly opts in
    # (load_matching is shape-filtered, so pointing a foreign checkpoint at
    # a model would silently load nothing and mislabel a random-init run as
    # trained).
    here = os.path.dirname(os.path.abspath(__file__))
    ckpt = os.environ.get("BENCH_CKPT", "")
    if not ckpt:
        candidates = [os.path.join(here, "ckpts", f"bench_default_{model_name}")]
        if model_name == "MLICPP_S":
            candidates.append(os.path.join(here, "ckpts", "bench_default"))
        ckpt = next((c for c in candidates if os.path.isdir(c)), "")
    if not ckpt and os.environ.get("BENCH_ALLOW_RANDOM", "0") != "1":
        print(f"bench.py: no trained checkpoint for {model_name} "
              f"(looked for ckpts/bench_default_{model_name}; set BENCH_CKPT "
              "or BENCH_ALLOW_RANDOM=1 to bench random-init weights — their "
              "escape-heavy streams are ~10x the trained rate and "
              "unrepresentative).", file=sys.stderr, flush=True)
        _STATE["extra"]["error"] = "no_trained_checkpoint"
        sys.exit(2)

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

    # On-hardware bit-exactness check of the Pallas row-select kernel: the
    # encode/decode bit-agreement invariant rides on it (CLAUDE.md), and
    # interpret-mode CPU tests can't certify the Mosaic-compiled TPU body.
    # Random table + rows, kernel vs the definitional table[row] gather.
    try:
        from mlic_tpu.ops.pallas_select import (select_rows_pallas,
                                                use_pallas_select)
        if use_pallas_select():
            kt, kr = jax.random.split(jax.random.key(42))
            tbl = jax.random.normal(kt, (66, 4), jnp.float32)
            rows = jax.random.randint(kr, (8, 4096), 0, 66, jnp.int32)
            got = select_rows_pallas(rows, tbl)
            want = tbl[rows]  # gather: slow but definitional
            ok = all(bool(jnp.all(g == want[..., j]))
                     for j, g in enumerate(got))
            assert ok, "pallas select != table[row] on hardware"
            _STATE["extra"]["pallas_select_hw_check"] = "pass"
            vlog("pallas select hw check: pass")
        else:
            _STATE["extra"]["pallas_select_hw_check"] = (
                f"not_run_backend_{jax.default_backend()}")
    except AssertionError:
        raise
    except Exception as e:  # no pallas path on this backend: record, go on
        _STATE["extra"]["pallas_select_hw_check"] = f"skipped: {e!r}"[:120]

    # Optional fused residual-block kernel (MLIC_FUSED_BLOCKS=1, opt-in —
    # ops/pallas_fused_block).  Unlike the select kernel it does real
    # arithmetic, so on-hardware it's certified against the flax lowering
    # within a small tolerance; on failure the knob is turned OFF and the
    # bench proceeds on the flax path.
    try:
        from mlic_tpu.ops.pallas_fused_block import use_fused_blocks
        if use_fused_blocks():
            from mlic_tpu.models.layers import ResidualBlockWithStride
            mod = ResidualBlockWithStride(features=96, stride=2)
            xs = jax.random.normal(jax.random.key(7), (1, 64, 64, 8),
                                   jnp.float32)
            p = jax.jit(mod.init)(jax.random.key(8), xs)
            # two distinct jitted closures: the env knob is read at trace
            # time, so each compiles its own lowering
            fused_out = np.asarray(jax.jit(lambda v, q: mod.apply(v, q))(p, xs))
            os.environ["MLIC_FUSED_BLOCKS"] = "0"
            ref_out = np.asarray(jax.jit(lambda v, q: mod.apply(v, q))(p, xs))
            os.environ["MLIC_FUSED_BLOCKS"] = "1"
            err = float(np.max(np.abs(fused_out - ref_out)))
            if err < 1e-3:
                _STATE["extra"]["fused_blocks_hw_check"] = (
                    f"pass maxerr={err:.2e}")
                vlog(f"fused blocks hw check: pass ({err:.2e})")
            else:
                os.environ["MLIC_FUSED_BLOCKS"] = "0"
                _STATE["extra"]["fused_blocks_hw_check"] = (
                    f"FAIL maxerr={err:.2e} -> disabled")
    except Exception as e:
        os.environ["MLIC_FUSED_BLOCKS"] = "0"
        _STATE["extra"]["fused_blocks_hw_check"] = f"error->off: {e!r}"[:120]

    images = []
    pool = None
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
    # clock starts and make the MAIN loop staged (legacy switch; the staged
    # regime is now always measured via the segment probe below).
    staged = os.environ.get("BENCH_STAGED", "0") == "1"
    if staged:
        dev = jax.devices()[0]
        images = [jax.device_put(im, dev) for im in images]
        jax.block_until_ready(images)

    # Staged input sequence: >= 8 distinct device-resident batches, built
    # BEFORE warmup so both the warmup and the staged probe avoid the
    # tunnel's per-batch image upload (batch 128 Kodak frames = 151 MB;
    # measured tunnel weather reaches < 1 MB/s, in which the old
    # upload-first flow never got to the headline regime at all).  The
    # dead-leaves pool uploads once (24 frames, 28 MB); batches are lazy
    # on-device gathers (materializing 8+ batches up front costs ~1.2 GB
    # HBM; the gather is a sub-ms on-device copy counted in the timed
    # sections).
    staged_seq = None
    extra = _STATE["extra"]
    if backend == "device":
        try:
            dev = jax.devices()[0]
            n_buf = max(8, min(n_batches, 12))
            if content == "dead_leaves":
                pool_dev = jax.device_put(np.asarray(pool), dev)
                jax.block_until_ready(pool_dev)
                gather = jax.jit(lambda p_, i_: p_[i_])
                # stride-7 rotations: 8 distinct index patterns over the
                # 24-frame pool (stride-batch collapses to 3 mod 24)
                idxs = [jnp.asarray([(k * 7 + i) % len(pool)
                                     for i in range(batch)], jnp.int32)
                        for k in range(n_buf)]
                jax.block_until_ready(idxs)
                staged_seq = [(lambda k=k: gather(pool_dev, idxs[k]))
                              for k in range(n_buf)]
            else:
                bufs = [jax.device_put(images[1 + k % n_batches], dev)
                        for k in range(n_buf)]
                jax.block_until_ready(bufs)
                staged_seq = [(lambda k=k: bufs[k]) for k in range(n_buf)]
        except Exception as e:  # never sink the bench
            extra["staged_probe_error"] = repr(e)[:200]

    # Warmup: compile encode+decode paths.  Device-resident input when
    # available (no 151 MB host upload on the compile path).
    t = time.perf_counter()
    x_warm = staged_seq[0]() if staged_seq else images[0]
    enc = codec.compress(x_warm)
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
    total_bits = 0
    n = n_batches * batch
    bpp = 0.0

    def pipeline_run(imgs, deadline=None):
        # Two-deep software pipeline over the begin/end split: the device
        # executes programs back-to-back in dispatch order while the host
        # overlaps its stream downloads / z coding / parsing of batch i
        # with the device compute of batch i+1.  All work is counted — the
        # clock stops only after every x_hat checksum is fetched.
        # Entries may be callables (lazily device-gathered staged batches).
        # ``deadline`` (seconds from start) bounds the TUNNEL-inclusive
        # phase: once exceeded, no new batch is issued; completed batches
        # still count, so the rate stays honest (work_done / elapsed).
        get = lambda e: e() if callable(e) else e
        bits = 0
        done = 0
        t0 = time.perf_counter()
        h_enc = codec.compress_begin(get(imgs[0]))
        dec_pending = None  # (dec dict) awaiting checksum
        k = 0
        while h_enc is not None:
            nxt = None
            if k + 1 < len(imgs) and (
                    deadline is None
                    or time.perf_counter() - t0 < deadline):
                nxt = codec.compress_begin(get(imgs[k + 1]))
            enc = codec.compress_end(h_enc)
            bits += 8 * sum(len(s) for g in enc["strings"] for s in g)
            dec = codec.decompress(enc["strings"], enc["shape"], wait=False)
            if dec_pending is not None:
                checksum = float(jnp.sum(dec_pending["x_hat"]))
                assert np.isfinite(checksum)
            dec_pending = dec
            h_enc = nxt
            done += 1
            k += 1
        checksum = float(jnp.sum(dec_pending["x_hat"]))
        assert np.isfinite(checksum)
        return time.perf_counter() - t0, bits, done * batch

    def serial_run(imgs):
        # Serial schedule: enc then dec per batch, fenced by the x_hat
        # checksum before the next batch starts.  r5 profiling found the
        # two-deep pipeline can land BELOW this composite on the shared
        # chip (enc and dec both occupy the one TensorCore, so pipelining
        # hides only host work while adding dispatch boundaries); which
        # schedule wins is window weather, hence the interleaved auto A/B
        # in the staged probe.
        get = lambda e: e() if callable(e) else e
        bits = 0
        t0 = time.perf_counter()
        for e in imgs:
            enc = codec.compress(get(e))
            bits += 8 * sum(len(s) for g in enc["strings"] for s in g)
            dec = codec.decompress(enc["strings"], enc["shape"])
            checksum = float(jnp.sum(dec["x_hat"]))
            assert np.isfinite(checksum)
        return time.perf_counter() - t0, bits, len(imgs) * batch

    def make_quiet_probes():
        """Co-probes for post-hoc contention triage (PARITY 'shared-chip
        contention'): a chained MXU matmul (stays fast under co-tenant HBM
        traffic), an HBM-bandwidth sweep (stretches with it, like the codec
        programs), and a bare scalar fetch (tunnel RTT + rescheduling
        stall).  Each timing includes one fetch; rtt_ms calibrates it."""
        a = jnp.ones((2048, 2048), jnp.bfloat16)
        mm = jax.jit(lambda a_: jax.lax.fori_loop(
            0, 64, lambda i, c: (c @ a_) * 0.5, a_)[0, 0])
        big = jnp.ones((64, 1 << 20), jnp.float32)  # 256 MB resident
        hb = jax.jit(lambda b_: jax.lax.fori_loop(
            0, 32, lambda i, acc: acc + (b_ * (1.0 + i)).sum(), 0.0))
        one = jnp.zeros((), jnp.float32)
        float(mm(a)); float(hb(big)); float(one + 0)  # compile + warm

        def probe():
            t0 = time.perf_counter(); float(mm(a))
            mxu = time.perf_counter() - t0
            t0 = time.perf_counter(); float(hb(big))
            hbm = time.perf_counter() - t0
            t0 = time.perf_counter(); float(one + 0)
            rtt = time.perf_counter() - t0
            return {"mxu64_ms": round(mxu * 1e3, 1),
                    "hbm8gb_ms": round(hbm * 1e3, 1),
                    "rtt_ms": round(rtt * 1e3, 1)}
        return probe

    if pipeline and backend == "device":
        if not staged and staged_seq is not None \
                and os.environ.get("BENCH_STAGED_PROBE", "1") == "1":
            # Staged regime (the HEADLINE) runs FIRST: >= 8 distinct
            # device-resident batches, median over >= 3 segments, quietness
            # co-probes before/after.  r3's single 3-buffer capture recorded
            # whatever window the driver hit (5.13 vs builder 12.7 img/s,
            # same code); running it before the tunnel-bound phase also
            # means bad tunnel weather cannot starve the headline.
            try:
                probe = make_quiet_probes()
                extra["quiet_before"] = probe()
                segs = int(os.environ.get("BENCH_STAGED_SEGS", "3"))
                # Execution-schedule A/B (same work, same measurement —
                # only HOW the enc+dec of each segment is scheduled):
                # ``auto`` splits every segment into an adjacent pipelined
                # half and serial half (time-interleaved, so window drift
                # cancels) and the headline takes the faster arm's median.
                mode = os.environ.get("BENCH_STAGED_MODE", "auto")
                n_buf = len(staged_seq)
                arms = {"pipelined": [], "serial": []}
                st_bits = st_imgs = 0
                n_done = 0
                for s_ in range(segs):
                    seq = [staged_seq[(s_ + k) % n_buf]
                           for k in range(n_batches)]
                    if mode == "auto" and n_batches >= 2:
                        half = n_batches // 2
                        el_p, b_p, n_p = pipeline_run(seq[:half])
                        el_s, b_s, n_s = serial_run(seq[half:2 * half])
                        arms["pipelined"].append(n_p / el_p)
                        arms["serial"].append(n_s / el_s)
                        st_bits, st_imgs = b_p + b_s, n_p + n_s
                        vlog(f"staged seg{s_}: pipelined "
                             f"{arms['pipelined'][-1]:.2f} / serial "
                             f"{arms['serial'][-1]:.2f} img/s")
                    elif mode == "serial":
                        el, b_, n_ = serial_run(seq)
                        arms["serial"].append(n_ / el)
                        st_bits, st_imgs = b_, n_
                        vlog(f"staged seg{s_}: "
                             f"{arms['serial'][-1]:.2f} img/s (serial)")
                    else:
                        el, b_, n_ = pipeline_run(seq)
                        arms["pipelined"].append(n_ / el)
                        st_bits, st_imgs = b_, n_
                        vlog(f"staged seg{s_}: "
                             f"{arms['pipelined'][-1]:.2f} img/s")
                    n_done = s_ + 1
                    # deadline guard: keep what exists over more segments
                    if _tleft() < 60 and n_done < segs:
                        extra["staged_segments_cut"] = segs - n_done
                        break
                extra["quiet_after"] = probe()
                med = lambda r: sorted(r)[len(r) // 2]
                if arms["pipelined"] and arms["serial"]:
                    extra["staged_ab"] = {
                        k: round(med(v), 4) for k, v in arms.items()}
                chosen = max((k for k in arms if arms[k]),
                             key=lambda k: med(arms[k]))
                rates = sorted(arms[chosen])
                extra["staged_mode"] = chosen
                extra["staged_img_s"] = round(med(rates), 4)
                extra["staged_best"] = round(rates[-1], 4)
                extra["staged_worst"] = round(rates[0], 4)
                extra["staged_segments"] = len(rates)
                extra["staged_buffers"] = n_buf
                bpp = st_bits / (st_imgs * h * w)
                extra["bpp" if ckpt else "bpp_random_init"] = round(bpp, 4)
                extra.update({
                    "n_images": n_batches * batch, "batch": batch,
                    "backend": backend, "ckpt": bool(ckpt),
                    "device": str(jax.devices()[0]), "content": content,
                    "fenced": True, "staged": staged})
                # EMIT THE HEADLINE NOW: nothing measured later changes it,
                # and r4 proved the later phases can outlive the driver
                # budget.  A superseding line with the enc/dec split and
                # the pipelined number follows if time allows.
                _emit(extra["staged_img_s"], "staged_median")
            except Exception as e:  # the probe must never sink the bench
                extra["staged_probe_error"] = repr(e)[:200]
        # Sequential probe for the enc/dec split (the reference times
        # encode and decode separately from a device-resident tensor,
        # utils/testing.py:403-424 + models/mlicpp.py:199-201 — so the
        # probe uses staged inputs when available).  Median of 3 so one
        # contended dispatch doesn't define the split.
        if _tleft() > 60:
            et, dt = [], []
            for k in range(3):
                x_in = staged_seq[k % len(staged_seq)]() if staged_seq \
                    else images[1 + k % n_batches]
                tb = time.perf_counter()
                enc = codec.compress(x_in)
                te = time.perf_counter()
                dec = codec.decompress(enc["strings"], enc["shape"])
                checksum = float(jnp.sum(dec["x_hat"]))
                assert np.isfinite(checksum)
                td = time.perf_counter()
                et.append(te - tb)
                dt.append(td - te)
                if _tleft() < 45:
                    break
            med = lambda ts: sorted(ts)[len(ts) // 2]
            extra["enc_img_s"] = round(batch / med(et), 4)
            extra["dec_img_s"] = round(batch / med(dt), 4)
            extra["split"] = ("sequential_probe_batch_median3_staged"
                              if staged_seq else
                              "sequential_probe_batch_median3")
        else:
            extra["split"] = "skipped_deadline"
        # Tunnel-inclusive pipelined phase LAST, under a time budget
        # (BENCH_PIPELINE_BUDGET seconds, default 300, further clamped by
        # the global deadline): each batch uploads batch x 1.2 MB through
        # the dev tunnel whose measured weather spans 0.3-60 MB/s; past the
        # budget no new batch is issued and the rate is computed over the
        # work that completed.
        budget = float(os.environ.get("BENCH_PIPELINE_BUDGET", "300"))
        budget = min(budget, max(0.0, _tleft() - 45.0))
        if budget > 30:
            elapsed, total_bits, n_done = pipeline_run(
                images[1:n_batches + 1], deadline=budget)
            pipelined_img_s = n_done / elapsed
            bpp = total_bits / (n_done * h * w)
            extra["aggregation"] = "pipelined_aggregate"
            if n_done < n:
                extra["pipelined_batches_done"] = n_done // batch
            n = n_done
        else:
            extra["aggregation"] = "pipelined_skipped_deadline"
            pipelined_img_s = None
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
        pipelined_img_s = batch / bt[len(bt) // 2]
        bpp = total_bits / (n * h * w)
        med = lambda ts: sorted(ts)[len(ts) // 2]
        extra.update({
            "aggregation": "median_batch",
            "enc_img_s": round(batch / med(enc_times), 4),
            "dec_img_s": round(batch / med(dec_times), 4),
            "best": round(batch / bt[0], 4),
            "worst": round(batch / bt[-1], 4),
            "mean": round(n / elapsed, 4)})

    # Final (superseding) line: the staged headline again when it exists,
    # now with the enc/dec split and the pipelined extras; the pipelined
    # number, labeled, otherwise (declared in BASELINE.md).
    extra.setdefault("bpp" if ckpt else "bpp_random_init", round(bpp, 4))
    extra.update({"n_images": n, "batch": batch, "backend": backend,
                  "ckpt": bool(ckpt), "device": str(jax.devices()[0]),
                  "content": content, "fenced": True, "staged": staged})
    if pipelined_img_s is not None:
        extra["pipelined_img_s"] = round(pipelined_img_s, 4)
    if staged:
        _emit(pipelined_img_s, "staged_main")  # main loop was staged
    elif "staged_img_s" in extra:
        _emit(extra["staged_img_s"], "staged_median")
    elif pipelined_img_s is not None:
        _emit(pipelined_img_s, "pipelined_fallback")
    # else: the early staged emission (if any) already stands; atexit
    # fallback covers the nothing-measured case.


if __name__ == "__main__":
    main()
