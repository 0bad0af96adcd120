"""Stage-level wall-time breakdown of the codec's compress/decompress.

Times each phase of the device-backend pipeline separately (device work is
block_until_ready'd per stage, transfers measured explicitly) so perf work
targets the real bottleneck instead of the presumed one.  Stages:

  compress:   upload | analyze | encode_pass | rans_encode | stream_dl
              | z_host
  decompress: z_host | parse | upload | device_pass

Usage:  python tools/profile_codec.py  (env: PROF_MODEL/BATCH/REPS/LANES/
        CKPT — same conventions as bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class T:
    """Named wall-time accumulator."""

    def __init__(self):
        self.acc: dict[str, float] = {}

    def add(self, name, dt):
        self.acc[name] = self.acc.get(name, 0.0) + dt

    def section(self, name):
        return _Sec(self, name)


class _Sec:
    def __init__(self, t, name):
        self.t, self.name = t, name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.t.add(self.name, time.perf_counter() - self.t0)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("PROF_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")

    from mlic_tpu.codec import Codec, _bucket
    from mlic_tpu.data.folder import synthetic_batches
    from mlic_tpu.models.registry import get_model

    model_name = os.environ.get("PROF_MODEL", "MLICPP_S")
    batch = int(os.environ.get("PROF_BATCH", "8"))
    reps = int(os.environ.get("PROF_REPS", "3"))
    n_lanes = int(os.environ.get("PROF_LANES", "512"))
    h, w = 512, 768

    model = get_model(model_name)
    if os.environ.get("PROF_BF16", "1") == "1":
        import dataclasses
        model = type(model)(cfg=dataclasses.replace(
            model.cfg, transform_dtype="bfloat16"))
    rng = {"params": jax.random.key(0), "noise": jax.random.key(1)}
    x0 = jnp.zeros((batch, h, w, 3), jnp.float32)
    params = jax.jit(lambda r, v: model.init(r, v, True))(rng, x0)["params"]
    jax.block_until_ready(params)

    ckpt = os.environ.get("PROF_CKPT", "")
    default_ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ckpts", "bench_default")
    if not ckpt and os.path.isdir(default_ckpt):
        ckpt = default_ckpt
    if ckpt:
        import orbax.checkpoint as ocp

        from mlic_tpu.utils.checkpoint import load_matching
        raw = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
        params = load_matching(params, raw.get("params", raw))
        print(f"# ckpt: {ckpt}", file=sys.stderr)

    codec = Codec(model, params, backend="device", n_lanes=n_lanes)
    codec.update()
    print(f"# parametric tables: {codec.parametric}", file=sys.stderr)

    imgs = []
    for b in synthetic_batches(batch, 64, steps=reps + 1, seed=7):
        img = np.tile(b, (1, h // 64 + 1, w // 64 + 1, 1))[:, :h, :w, :]
        imgs.append(np.round(img * 255).astype(np.uint8))

    # -------- instrumented compress (mirrors Codec.compress, device path)
    def compress(t, x_np):
        with t.section("c.upload"):
            x = jnp.asarray(x_np)
            jax.block_until_ready(x)
        with t.section("c.gain"):
            scale = codec._gain_scale(codec.params, jnp.asarray(0, jnp.int32),
                                      jnp.asarray(0.0, jnp.float32))
            jax.block_until_ready(scale)
        with t.section("c.analyze"):
            y, z_symbols, z16 = codec._analyze(codec.params, x, 1.0)
            float(jnp.sum(y))  # real execution fence
        with t.section("c.encode_pass"):
            out = codec._encode_pass(codec.params, y, z_symbols, scale, 1.0)
            float(jnp.sum(out[2].astype(jnp.int32)))  # real execution fence
        x_hat, y_hat, sym16, sym8, idx, flags, _sym32 = out
        with t.section("c.rans_encode"):
            rans = codec._rans_encode(sym16, idx, codec._dev_tables)
            float(jnp.sum(rans["img_n"]))  # real execution fence
        with t.section("c.flags_dl"):
            flags_np = np.asarray(flags)
        with t.section("c.z_dl"):
            z_np = np.asarray(z_symbols if flags_np[2] else z16).astype(np.int32)
        with t.section("c.z_host"):
            z_strings = codec._encode_z(z_np, 1.0, x_np.shape[0])
        with t.section("c.stream_dl"):
            y_strings = codec._download_streams(rans, x_np.shape[0])
        return {"strings": [y_strings, z_strings],
                "shape": (int(z_np.shape[1]), int(z_np.shape[2]))}

    # -------- instrumented decompress
    def decompress(t, strings, shape):
        from mlic_tpu.entropy.rans import decode_with_indexes
        from mlic_tpu.entropy.rans.coder import parse_global
        y_strings, z_strings = strings
        bsz = len(y_strings)
        zh, zw = shape
        n_ch = codec.model.cfg.N
        with t.section("d.gain"):
            scale = codec._gain_scale(codec.params, jnp.asarray(0, jnp.int32),
                                      jnp.asarray(0.0, jnp.float32))
            jax.block_until_ready(scale)
        with t.section("d.z_host"):
            eb_cdfs, eb_lengths, eb_offsets, _ = codec._eb_for(1.0)
            z_idx = np.broadcast_to(np.arange(n_ch, dtype=np.int32),
                                    (zh, zw, n_ch))
            z_symbols = np.stack([
                decode_with_indexes(z_strings[b], z_idx.ravel(), eb_cdfs,
                                    eb_lengths, eb_offsets).reshape(zh, zw, n_ch)
                for b in range(bsz)])
        with t.section("d.parse"):
            words_list, img_begins, escs, esc_begins = [], [], [], []
            off = 0
            eoff = 0
            for b in range(bsz):
                _nl, wds, esc = parse_global(y_strings[b])
                words_list.append(wds)
                img_begins.append(off)
                off += len(wds)
                escs.append(esc)
                esc_begins.append(eoff)
                eoff += len(esc)
            words = np.concatenate(words_list)
            codec._words_bucket = max(codec._words_bucket, _bucket(len(words)))
            padded = np.zeros(codec._words_bucket, np.uint16)
            padded[:len(words)] = words
            img_begin = np.asarray(img_begins, np.int32)
            codec._esc_bucket = max(codec._esc_bucket,
                                    _bucket(max(eoff, 1), minimum=1024))
            esc_values = np.zeros(codec._esc_bucket, np.int32)
            if eoff:
                esc_values[:eoff] = np.concatenate(escs)
        with t.section("d.upload"):
            zdt = (np.int16 if np.abs(z_symbols).max(initial=0) <= 32767
                   else np.int32)
            z_dev = jnp.asarray(z_symbols.astype(zdt))
            w_dev = jnp.asarray(padded)
            lb_dev = jnp.asarray(img_begin)
            ev_dev = jnp.asarray(esc_values)
            ebg_dev = jnp.asarray(np.asarray(esc_begins, np.int32))
            jax.block_until_ready(w_dev)
        with t.section("d.device_pass"):
            x_hat, y_hat = codec._device_pass(
                codec.params, z_dev, w_dev, lb_dev, codec._dev_tables, scale,
                codec._dev_n_steps, 1.0, ev_dev, ebg_dev)
            # scalar download: block_until_ready alone does not force
            # execution on the axon runtime (see bench.py)
            float(jnp.sum(x_hat))
        return x_hat

    # Warmup (compiles + axon handshake).
    t_warm = T()
    enc = compress(t_warm, imgs[0])
    decompress(t_warm, enc["strings"], enc["shape"])
    print("# warmup done", file=sys.stderr)

    t = T()
    t0 = time.perf_counter()
    for x_np in imgs[1:]:
        enc = compress(t, x_np)
        decompress(t, enc["strings"], enc["shape"])
    total = time.perf_counter() - t0

    n = reps * batch
    out = {
        "model": model_name, "batch": batch, "reps": reps,
        "lanes": n_lanes, "ckpt": bool(ckpt),
        "parametric": bool(codec.parametric),
        "img_per_s": round(n / total, 3),
        "ms_per_image": {k: round(1000 * v / n, 3)
                         for k, v in sorted(t.acc.items())},
        "accounted_ms": round(1000 * sum(t.acc.values()) / n, 3),
        "total_ms": round(1000 * total / n, 3),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
