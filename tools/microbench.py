"""True device-time per module via in-program scan repetition.

tools/profile_modules.py times one jitted call per module; on the axon
dev-tunnel runtime every launch carries a multi-ms dispatch cost, so small
modules all read ~7-10 ms regardless of their real device time.  This tool
instead compiles ONE executable per module that runs the module ``reps``
times inside ``lax.scan`` with a serial data dependency between iterations
(so XLA cannot hoist or elide the body), fences once, and divides — giving
the module's actual on-device cost, which is what matters inside the fused
codec passes.

Usage: python tools/microbench.py  (env: MB_MODEL, MB_BATCH, MB_REPS, MB_SET)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mlic_tpu.models.config import model_config
    from mlic_tpu.models.context import (
        ChannelContext,
        EntropyParameters,
        LatentResidualPrediction,
        LinearGlobalInterContext,
        LinearGlobalIntraContext,
        LocalContext,
    )
    from mlic_tpu.models.transforms import (
        AnalysisTransform,
        HyperAnalysis,
        HyperSynthesis,
        SynthesisTransform,
    )

    name = os.environ.get("MB_MODEL", "MLICPP_S")
    B = int(os.environ.get("MB_BATCH", "8"))
    reps = int(os.environ.get("MB_REPS", "30"))
    which = os.environ.get("MB_SET", "all")  # all | ctx | gemm
    cfg = model_config(name)
    N, M, S, C = cfg.N, cfg.M, cfg.slice_num, cfg.slice_ch
    H, W = 512, 768
    h, w = H // 16, W // 16

    key = jax.random.key(0)
    rows = []

    def scan_time(label, fn, x, count=1, n_reps=None):
        """Time ``fn(x)`` repeated ``reps`` times with a serial dependency
        through a scalar carry.  ``optimization_barrier`` ties each
        iteration's inputs to the previous carry (dtype-agnostic — int
        symbol arrays included) so XLA can neither hoist the body out of
        the scan nor elide iterations."""
        n_r = n_reps or reps

        def body(carry, _):
            x_i, _c = jax.lax.optimization_barrier((x, carry))
            out = fn(x_i)
            leaves = jax.tree.leaves(out)
            out0 = leaves[0]
            return jnp.sum(out0).astype(jnp.float32) * 1e-30, None

        prog = jax.jit(lambda: jax.lax.scan(body, jnp.zeros(()), None,
                                            length=n_r)[0])
        float(prog())  # compile + warm + fence
        t0 = time.perf_counter()
        float(prog())
        ms = (time.perf_counter() - t0) / n_r * 1000
        rows.append({"module": label, "ms_per_call": round(ms, 3),
                     "calls_per_pass": count,
                     "ms_per_pass": round(ms * count, 3)})
        print(f"{label:36s} {ms:8.3f} ms x{count} = {ms*count:8.2f} ms/pass",
              flush=True)
        return ms

    def bench_mod(label, module, args, count=1):
        params = module.init(key, *args)
        if len(args) == 1:
            scan_time(label, lambda x: module.apply(params, x), args[0], count)
        else:
            # multi-arg: thread the carry through the first arg only
            a0, rest = args[0], args[1:]
            scan_time(label, lambda x: module.apply(params, x, *rest), a0,
                      count)

    x_img = jax.random.normal(key, (B, H, W, 3), jnp.float32)
    y_lat = jax.random.normal(key, (B, h, w, M), jnp.float32)
    z_lat = jax.random.normal(key, (B, h // 4, w // 4, N), jnp.float32)
    sl = jax.random.normal(key, (B, h, w, C), jnp.float32)

    if which in ("all", "gemm"):
        # MXU probe: quietness reference (PARITY.md "shared-chip
        # contention" — MXU-resident matmuls stay fast under co-tenant HBM
        # traffic; if THIS is slow, the whole session is contended).
        mp = jax.random.normal(key, (2048, 2048), jnp.float32)
        wp = jax.random.normal(key, (2048, 2048), jnp.float32)
        ms = scan_time("mxu_probe[2048^3 f32]", lambda x: x @ wp, mp)
        gf = 2 * 2048**3 / (ms * 1e-3) / 1e12
        print(f"  -> {gf:.1f} TFLOP/s", flush=True)
        # Floor: one plain GEMM at the widest EP size, fp32 and bf16.
        L = B * h * w
        a32 = jax.random.normal(key, (L, 2 * M + 10 * C), jnp.float32)
        w32 = jax.random.normal(key, (2 * M + 10 * C, 320), jnp.float32)
        scan_time("gemm[LxKx320] f32", lambda x: x @ w32, a32)
        a16, w16 = a32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16)
        scan_time("gemm[LxKx320] bf16", lambda x: (x @ w16), a16)

    if which in ("all", "ctx"):
        bench_mod("EntropyParameters(widest)",
                  EntropyParameters(out_dim=2 * C),
                  (jax.random.normal(key, (B, h, w, 2 * M + 10 * C),
                                     jnp.float32),), count=2 * S)
        bench_mod("LRP(widest)",
                  LatentResidualPrediction(out_dim=C, in_dim=M + S * C),
                  (jax.random.normal(key, (B, h, w, M + S * C), jnp.float32),),
                  count=2 * S)
        bench_mod("LocalContext",
                  LocalContext(dim=C, window_size=cfg.context_window),
                  (sl,), count=S)
        cat4 = jax.random.normal(key, (B, h, w, C * (S - 1)), jnp.float32)
        bench_mod(f"ChannelContext[i={S-1}]",
                  ChannelContext(out_dim=C, hidden=(192, 128)), (cat4,))
        bench_mod(f"GlobalInter[i={S-1}]",
                  LinearGlobalInterContext(dim=C * (S - 1), out_dim=2 * C,
                                           num_heads=max(C * (S - 1) // 32, 1)),
                  (cat4,))
        bench_mod("GlobalIntra", LinearGlobalIntraContext(dim=C), (sl, sl),
                  count=S - 1)

    if which in ("all", "pass"):
        # Whole codec_encode_pass as one scan body: true in-program cost of
        # the 20-phase context stack INCLUDING the inter-module glue
        # (concats, checkerboard squeezes, build_indexes, symbol packing) —
        # the delta vs the module-sum is the glue share; the delta vs a
        # single dispatched call is dispatch/runtime overhead.
        from mlic_tpu.models.registry import get_model
        model = get_model(name)
        rngs = {"params": jax.random.key(1), "noise": jax.random.key(2)}
        x0 = jnp.zeros((B, H, W, 3), jnp.float32)
        params = jax.jit(lambda r, v: model.init(r, v, True))(rngs, x0)["params"]
        jax.block_until_ready(params)
        z0 = jnp.zeros((B, h // 4, w // 4, N), jnp.int32)
        cls = type(model)
        for recon in (True, False):
            # NOTE: only syms consumed -> with recon=True XLA still DCEs
            # g_s; the pair is kept to confirm that equivalence.
            fn = lambda yy, _r=recon: model.apply(
                {"params": params}, yy, z0, 1.0, 1.0, _r,
                method=cls.codec_encode_pass)[3]
            scan_time(f"codec_encode_pass(recon={recon})",
                      fn, y_lat)
        # Same executable, dispatched `reps` times back-to-back from the
        # host with ONE final fence: the delta vs the in-scan figure is
        # pure per-dispatch runtime overhead (axon queueing / co-tenant
        # time-slicing), which a single-dispatch pipeline design avoids.
        dfn = jax.jit(lambda yy: model.apply(
            {"params": params}, yy, z0, 1.0, 1.0, False,
            method=cls.codec_encode_pass)[3])
        s8 = dfn(y_lat)
        float(jnp.sum(s8.astype(jnp.int32)))  # compile + fence
        t0 = time.perf_counter()
        outs = [dfn(y_lat) for _ in range(reps)]
        acc = sum(float(jnp.sum(o.astype(jnp.int32))) == 0 for o in outs[-1:])
        ms = (time.perf_counter() - t0) / reps * 1000
        del acc
        rows.append({"module": "encode_pass dispatched xN, 1 fence",
                     "ms_per_call": round(ms, 3), "calls_per_pass": 1,
                     "ms_per_pass": round(ms, 3)})
        print(f"{'encode_pass dispatched xN':36s} {ms:8.3f} ms", flush=True)

    if which == "encode":
        # Encode-side budget split at the BENCH configuration (r4 VERDICT
        # item 1): analyze (g_a+h_a) / 20-phase context pass / phase_order
        # layout / rANS encode scan / stream compaction / whole
        # _encode_full — each as an in-program scan with one fence.
        import dataclasses

        import numpy as np

        from mlic_tpu.codec import Codec, make_analyze_fn, make_encode_full
        from mlic_tpu.entropy.device_rans import (
            compact_streams_global,
            encode_lanes,
            encode_positions_device,
            phase_order,
        )
        from mlic_tpu.models.registry import get_model
        model = get_model(name)
        tdt = os.environ.get("MB_TDT", "bfloat16")
        if tdt != "float32":
            model = type(model)(cfg=dataclasses.replace(
                model.cfg, transform_dtype=tdt))
        rngs = {"params": jax.random.key(1), "noise": jax.random.key(2)}
        x0 = jnp.zeros((B, H, W, 3), jnp.float32)
        params = jax.jit(lambda r, v: model.init(r, v, True))(rngs, x0)["params"]
        ckpt = os.environ.get("MB_CKPT", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ckpts", "bench_default"))
        if os.path.isdir(ckpt) and name == "MLICPP_S":
            import orbax.checkpoint as ocp

            from mlic_tpu.utils.checkpoint import load_matching
            raw = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
            params = load_matching(params, raw.get("params", raw))
        n_lanes = int(os.environ.get("MB_LANES", "512"))
        codec = Codec(model, params, backend="device", n_lanes=n_lanes,
                      encode_recon=False)
        codec.update()
        tables = codec._dev_tables_for(1.0)
        z_rows_base = codec._z_rows_base
        from mlic_tpu.data.folder import dead_leaves_pool
        pool = dead_leaves_pool(min(B, 24), H, seed=1303, width=W)
        xf = jnp.asarray(np.asarray(pool)[
            np.arange(B) % len(pool)]).astype(jnp.float32) / 255.0
        cls = type(model)
        n_ph = 2 * cfg.slice_num

        analyze = make_analyze_fn(model)
        scan_time("analyze(g_a+h_a+round)",
                  lambda xx: analyze(params, xx, 1.0), xf)
        # real latents for the downstream components
        y, z_symbols, _z16 = jax.jit(analyze)(params, xf, 1.0)
        jax.block_until_ready(y)

        enc_pass = lambda yy: model.apply(
            {"params": params}, yy, z_symbols, 1.0, 1.0, False,
            method=cls.codec_encode_pass)
        scan_time("codec_encode_pass(recon=False)", enc_pass, y)
        out = jax.jit(enc_pass)(y)
        _xh, _yh, sym16, _sym8, idx, _flags, sym32 = out
        sym32 = jax.block_until_ready(sym32)
        idx = jax.block_until_ready(idx)

        pad_row = int(tables["offsets"].shape[0] - 1)

        def layout(args):
            s32, ii = args
            ss = jnp.concatenate(
                [phase_order(s32[:, k * (s32.shape[1] // n_ph):
                                 (k + 1) * (s32.shape[1] // n_ph)],
                             n_lanes, pad_row, 0) for k in range(n_ph)], 0)
            rr = jnp.concatenate(
                [phase_order(ii.astype(jnp.int32)[:, k * (ii.shape[1] // n_ph):
                                                  (k + 1) * (ii.shape[1] // n_ph)],
                             n_lanes, pad_row, pad_row) for k in range(n_ph)], 0)
            return ss, rr

        scan_time("phase_order layout (sym+idx)", layout, (sym32, idx))
        sym_steps, row_steps = jax.jit(layout)((sym32, idx))
        sym_steps = jax.block_until_ready(sym_steps)

        an = codec.analytic_enc_rows
        scan_time("rANS encode scan (gather prep)",
                  lambda a: encode_lanes(a[0], a[1], tables),
                  (sym_steps, row_steps))
        if an:
            scan_time("rANS encode scan (analytic prep)",
                      lambda a: encode_lanes(a[0], a[1], tables,
                                             analytic_rows=an),
                      (sym_steps, row_steps))
        xw = jax.jit(lambda a: encode_lanes(a[0], a[1], tables,
                                            analytic_rows=an))(
            (sym_steps, row_steps))
        xst, words, emits, esc = jax.block_until_ready(xw)

        scan_time("compact_streams_global",
                  lambda a: compact_streams_global(a[0], a[1], a[2], a[3],
                                                   sym_steps, B),
                  (xst, words, emits, esc))

        scan_time("rANS enc total (layout+scan+compact)",
                  lambda a: encode_positions_device(
                      *layout(a), tables, B, fmt="global",
                      analytic_rows=an),
                  (sym32, idx))

        enc_full = make_encode_full(model, n_lanes, False, unified_z=True,
                                    z_rows_base=z_rows_base,
                                    analytic_rows=an)
        scan_time("_encode_full (v4, whole program)",
                  lambda xx: enc_full(params, xx, 1.0, 1.0, tables)["rans"],
                  xf)

    if which == "decode":
        # True in-program cost of codec_device_pass (context stack + rANS
        # decode scan + g_s) on a REAL stream: compress one batch with the
        # production codec, then scan-repeat the decode over it.
        import numpy as np

        from mlic_tpu.codec import Codec, _bucket
        from mlic_tpu.entropy.rans.coder import parse_global
        from mlic_tpu.models.registry import get_model
        model = get_model(name)
        rngs = {"params": jax.random.key(1), "noise": jax.random.key(2)}
        x0 = jnp.zeros((B, H, W, 3), jnp.float32)
        params = jax.jit(lambda r, v: model.init(r, v, True))(rngs, x0)["params"]
        ckpt = os.environ.get("MB_CKPT", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ckpts", "bench_default"))
        if os.path.isdir(ckpt) and name == "MLICPP_S":
            import orbax.checkpoint as ocp

            from mlic_tpu.utils.checkpoint import load_matching
            raw = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
            params = load_matching(params, raw.get("params", raw))
        n_lanes = int(os.environ.get("MB_LANES", "512"))
        codec = Codec(model, params, backend="device", n_lanes=n_lanes)
        codec.update()
        from mlic_tpu.data.folder import dead_leaves_pool
        pool = dead_leaves_pool(B, H, seed=1303, width=W)
        enc = codec.compress(pool[:B])
        y_strings = enc["strings"][0]
        z_np = np.stack([np.zeros((H // 64, W // 64, N), np.int16)] * B)
        # reuse the encoder-side z (already int16-safe for trained models)
        words_list, img_begins = [], []
        off = 0
        for b in range(B):
            _nl, wds, esc = parse_global(y_strings[b])
            words_list.append(wds)
            img_begins.append(off)
            off += len(wds)
        words = np.concatenate(words_list)
        padded = np.zeros(_bucket(len(words)), np.uint16)
        padded[:len(words)] = words
        img_begin = jnp.asarray(np.asarray(img_begins, np.int32))
        w_dev = jnp.asarray(padded)
        z_dev = jnp.asarray(z_np)
        ev = jnp.zeros(1024, jnp.int32)
        ebg = jnp.zeros(B, jnp.int32)
        cls = type(model)

        def dec_fn(zz):
            return model.apply({"params": params}, zz, w_dev, img_begin,
                               codec._dev_tables, 1.0, n_lanes,
                               codec._dev_n_steps, 1.0, ev, ebg,
                               method=cls.codec_device_pass)[0]

        scan_time(f"codec_device_pass(lanes={n_lanes})", dec_fn, z_dev)

    if which == "fusedblk":
        # Interleaved A/B of the transform stacks: flax lowering vs the
        # Pallas fused residual-block tails (ops/pallas_fused_block), both
        # as in-program scans compiled in ONE session and timed in
        # alternating segments (cancels window drift — PARITY.md
        # measurement policy).  MB_TDT=float32 | bfloat16_mixed.
        tdt = os.environ.get("MB_TDT", "float32")
        mixed = tdt == "bfloat16_mixed"
        dt = jnp.bfloat16 if mixed else None
        gdt = jnp.bfloat16 if mixed else None
        progs = {}
        for mode in ("flax", "fused"):
            os.environ["MLIC_FUSED_BLOCKS"] = "1" if mode == "fused" else "0"
            for label, module, inp in (
                    ("g_a", AnalysisTransform(N=N, M=M, dtype=dt,
                                              gdn_dtype=gdt), x_img),
                    ("g_s", SynthesisTransform(N=N, M=M, dtype=dt,
                                               gdn_dtype=gdt), y_lat)):
                params = jax.jit(module.init)(key, inp)

                def prog_fn(module=module, params=params, inp=inp):
                    def body(carry, _):
                        x_i, _c = jax.lax.optimization_barrier((inp, carry))
                        out = module.apply(params, x_i)
                        return jnp.sum(out).astype(jnp.float32) * 1e-30, None
                    return jax.lax.scan(body, jnp.zeros(()), None,
                                        length=reps)[0]

                prog = jax.jit(prog_fn)
                float(prog())  # trace under this env + compile + fence
                progs[f"{label}[{mode}]"] = prog
        # equality spot check (same params per pair would need shared init;
        # init is deterministic from `key`, so flax/fused pairs share params)
        for seg in range(2):
            for label, prog in progs.items():
                t0 = time.perf_counter()
                float(prog())
                ms = (time.perf_counter() - t0) / reps * 1000
                rows.append({"module": f"{label} seg{seg} tdt={tdt}",
                             "ms_per_call": round(ms, 3),
                             "calls_per_pass": 1, "ms_per_pass": round(ms, 3)})
                print(f"{label} seg{seg}: {ms:8.2f} ms/call", flush=True)

    if which == "train":
        # Contention-cancelling interleaved A/B of the training step:
        # fp32 vs bfloat16_mixed transforms, both as in-program scans in
        # ONE session, alternated (VERDICT r2 weak #5).  ms/step each.
        import dataclasses

        from mlic_tpu.models.registry import get_model
        from mlic_tpu.train.trainer import (TrainConfig, create_train_state,
                                            make_train_step)
        cfg_t = TrainConfig(lmbda=0.025)
        # MB_PATCH: the full 256^2 pair of scan programs can exceed a
        # contended window's compile budget; 128^2 keeps the A/B feasible
        # (the policy delta is per-op dtype, not resolution-dependent).
        P = int(os.environ.get("MB_PATCH", "256"))
        batch = jax.random.uniform(jax.random.key(5), (B, P, P, 3))
        variants = {}
        for tdt in ("float32", "bfloat16_mixed"):
            mdl = get_model(name)
            mdl = type(mdl)(cfg=dataclasses.replace(mdl.cfg,
                                                    transform_dtype=tdt))
            state, tx = create_train_state(mdl, cfg_t,
                                           input_shape=batch.shape)
            step = make_train_step(mdl, tx, cfg_t)

            def prog_fn(state=state, step=step):
                def body(st, _):
                    st2, _m = step(st, batch)
                    return st2, None
                return jax.lax.scan(body, state, None, length=reps)[0]

            prog = jax.jit(prog_fn)
            out = prog()
            jax.block_until_ready(out.params)
            float(jnp.sum(out.step.astype(jnp.float32)))  # fence
            variants[tdt] = prog
        # Interleave timed segments A/B/A/B to cancel window drift.
        for seg in range(2):
            for tdt, prog in variants.items():
                t0 = time.perf_counter()
                out = prog()
                float(jnp.sum(out.step.astype(jnp.float32)))
                ms = (time.perf_counter() - t0) / reps * 1000
                rows.append({"module": f"train_step[{tdt}] seg{seg}",
                             "ms_per_call": round(ms, 3),
                             "calls_per_pass": 1, "ms_per_pass": round(ms, 3)})
                print(f"train_step[{tdt}] seg{seg}: {ms:8.2f} ms/step",
                      flush=True)

    if which == "all":
        bench_mod("h_s (HyperSynthesis)", HyperSynthesis(M=M, N=N), (z_lat,))
        bench_mod("g_s (SynthesisTransform)", SynthesisTransform(N=N, M=M),
                  (y_lat,))
        bench_mod("g_a (AnalysisTransform)", AnalysisTransform(N=N, M=M),
                  (x_img,))
        bench_mod("h_a (HyperAnalysis)", HyperAnalysis(M=M, N=N), (y_lat,))

    rows.sort(key=lambda r: -r["ms_per_pass"])
    print(json.dumps({"model": name, "batch": B, "reps": reps,
                      "latent": [h, w], "modules": rows}))


if __name__ == "__main__":
    main()
