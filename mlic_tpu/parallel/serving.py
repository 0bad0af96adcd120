"""Data-parallel SERVING: the codec sharded over a device mesh.

The reference serves one GPU per process (its eval loop is
single-device, ``MLIC++/utils/testing.py:403-571``).  TPU-native serving
instead runs ONE program over an ICI-connected mesh: the batch dimension
is sharded with ``jax.shard_map``, every chip executes the identical
encode/decode executables on its local shard (images are independent —
no collectives on the hot path), and the host assembles per-image
bitstreams from the per-shard buffers (format v4 — hyper-latent inline,
fully on-device entropy coding — by default; v3 with separate host-coded
z strings under MLIC_UNIFIED_Z=0).  Scaling is linear by construction;
the same code drives 1 chip or a v5e pod slice.

Differences from the single-device ``Codec``:

* ``compress``/``decompress`` require ``batch % mesh_size == 0``.
* The v3 path's int16/int32 symbol-overflow fallbacks (degenerate
  untrained latents) are NOT supported here — trained serving never hits
  them; the flags are checked and raise instead of silently degrading.
  (The v4 path codes int32 symbols directly, so no fallback exists.)
* ``compress`` returns no ``y_hat`` (serving delivers bitstreams;
  ``encode_recon=True`` still returns ``x_hat``).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mlic_tpu.codec import Codec, _bucket, _dl_bucket, make_encode_full


class ShardedCodec(Codec):
    """``Codec`` with batch-sharded encode/decode programs over a mesh.

    Tables, parameters, and the VBR gain are replicated (``P()``);
    activations, streams, and escape side channels are sharded on the
    ``data`` axis.  Stream bytes are bit-identical to the single-device
    codec's (asserted in tests/test_serving_sharded.py): the per-image
    stream layout has no cross-image state, so sharding cannot change it.
    """

    def __init__(self, model, params: Any, mesh: Mesh, n_lanes: int = 512,
                 encode_recon: bool = False, axis: str = "data"):
        super().__init__(model, params, backend="device", n_lanes=n_lanes,
                         encode_recon=encode_recon)
        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.devices.size
        cls = type(model)

        enc_local = make_encode_full(
            model, n_lanes, encode_recon,
            analytic_rows=getattr(self, "analytic_enc_rows", 0))

        def enc_wrap(p, x, sc, zqs, tables):
            out = enc_local(p, x, sc, zqs, tables)
            kept = {"z16": out["z16"], "flags": out["flags"],
                    "rans": out["rans"]}
            if encode_recon:
                kept["x_hat"] = out["x_hat"]
            return kept

        rans_spec = {"buf": P(axis), "img_n": P(axis),
                     "ebuf": P(axis), "ecount": P(axis)}
        out_specs = {"z16": P(axis), "flags": P(axis), "rans": rans_spec}
        if encode_recon:
            out_specs["x_hat"] = P(axis)
        self._encode_sharded = jax.jit(jax.shard_map(
            enc_wrap, mesh=mesh,
            in_specs=(P(), P(axis), P(), P(), P()),
            out_specs=out_specs))

        def make_dec(n_steps):
            def dec_local(p, z, words, img_begin, tables, sc, zqs, ev, ebg):
                return model.apply({"params": p}, z, words, img_begin,
                                   tables, sc, n_lanes, n_steps, zqs, ev,
                                   ebg, method=cls.codec_device_pass)

            return jax.jit(jax.shard_map(
                dec_local, mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(axis), P(), P(), P(),
                          P(axis), P(axis)),
                out_specs=(P(axis), P(axis))))

        self._make_dec_sharded = make_dec
        self._dec_sharded = None
        self._dec_sharded_steps = None

    # ---------------- stream format v4 (unified y+z) -------------------
    def _build_unified(self):
        """Sharded twins of the v4 programs (built after ``update`` once
        ``z_rows_base`` is known): the encode keeps only the rans buffers
        (+x_hat) per shard — no z16 / flags downloads remain — and the
        decode program decodes z from the stream on every device."""
        super()._build_unified()
        base = self._z_rows_base
        model, cls = self.model, type(self.model)
        axis, mesh, nl = self.axis, self.mesh, self.n_lanes
        enc_local = make_encode_full(
            model, nl, self.encode_recon, unified_z=True, z_rows_base=base,
            analytic_rows=getattr(self, "analytic_enc_rows", 0))
        encode_recon = self.encode_recon

        def enc_wrap(p, x, sc, zqs, tables):
            out = enc_local(p, x, sc, zqs, tables)
            kept = {"rans": out["rans"]}
            if encode_recon:
                kept["x_hat"] = out["x_hat"]
            return kept

        rans_spec = {"buf": P(axis), "img_n": P(axis),
                     "ebuf": P(axis), "ecount": P(axis)}
        out_specs = {"rans": rans_spec}
        if encode_recon:
            out_specs["x_hat"] = P(axis)
        self._encode_sharded_v4 = jax.jit(jax.shard_map(
            enc_wrap, mesh=mesh,
            in_specs=(P(), P(axis), P(), P(), P()),
            out_specs=out_specs))

        def make_dec_v4(zh, zw, n_steps, z_steps_row):
            def dec_local(p, words, img_begin, tables, sc, zqs, ev, ebg):
                return model.apply(
                    {"params": p}, zh, zw, words, img_begin, tables, sc,
                    nl, n_steps, z_steps_row, base, zqs, ev, ebg,
                    method=cls.codec_device_pass_v4)

            return jax.jit(jax.shard_map(
                dec_local, mesh=mesh,
                in_specs=(P(), P(axis), P(axis), P(), P(), P(), P(axis),
                          P(axis)),
                out_specs=(P(axis), P(axis))))

        self._make_dec_sharded_v4 = make_dec_v4
        self._dec_sharded_v4: dict = {}

    # ------------------------------------------------------------------
    def compress_begin(self, x, s: int = 0, inputscale: float = 0.0) -> dict:
        """Dispatch half (no device->host fetch) — see Codec.compress_begin;
        here the one encode program is sharded over the mesh."""
        self._require_tables()
        t0 = time.perf_counter()
        scale = self._scale_for(s, inputscale)
        z_qs = self._z_qs_for(s, inputscale)
        x = jnp.asarray(x)
        if x.dtype != jnp.uint8:
            x = x.astype(jnp.float32)
        batch = x.shape[0]
        assert batch % self.n_dev == 0, (
            f"batch {batch} not divisible by {self.n_dev} devices")
        if self.unified_z:
            out = dict(self._encode_sharded_v4(
                self.params, x, jnp.asarray(scale, jnp.float32),
                jnp.asarray(z_qs, jnp.float32), self._dev_tables_for(z_qs)))
            out["zshape"] = (x.shape[1] // 64, x.shape[2] // 64)
        else:
            out = dict(self._encode_sharded(self.params, x,
                                            jnp.asarray(scale, jnp.float32),
                                            jnp.asarray(z_qs, jnp.float32),
                                            self._dev_tables))
        out.update(t0=t0, batch=batch, scale=scale, z_qs=z_qs)
        return out

    def _fetch_shard_streams(self, rans, batch: int, fmt_flags,
                             extra_fetch: tuple = ()):
        """One combined device->host fetch of the per-shard rans buffers
        (speculative bucket slice + any ``extra_fetch`` arrays), then
        per-image stream assembly with shard-local word offsets."""
        nd = self.n_dev
        bl = batch // nd
        cap = rans["buf"].shape[0] // nd
        ecap = rans["ebuf"].shape[0] // nd
        spec = getattr(self, "_sh_words_bucket", 0)
        buf2 = rans["buf"].reshape(nd, cap)
        img_n, ecount, buf0, *extra = jax.device_get(
            [rans["img_n"], rans["ecount"], buf2[:, :spec]]
            + list(extra_fetch))
        img_n = np.asarray(img_n).reshape(nd, bl)
        ecount = np.asarray(ecount).reshape(nd, bl)
        need = int(img_n.sum(axis=1).max())
        self._sh_words_bucket = min(max(spec, _dl_bucket(need)), cap)
        if need <= spec:
            bufs = np.asarray(buf0)
        else:
            bufs = np.concatenate(
                [np.asarray(buf0),
                 np.asarray(jax.device_get(
                     buf2[:, spec:self._sh_words_bucket]))], axis=1)
        if int(ecount.sum()):
            eneed = int(ecount.sum(axis=1).max())
            self._sh_esc_bucket = min(
                max(getattr(self, "_sh_esc_bucket", 0),
                    _dl_bucket(eneed, minimum=1024)), ecap)
            ebufs = np.asarray(jax.device_get(
                rans["ebuf"].reshape(nd, ecap)[:, :self._sh_esc_bucket]))
        else:
            ebufs = np.zeros((nd, 0), np.int32)

        nl = self.n_lanes
        y_strings = []
        for d in range(nd):
            begins = np.concatenate([[0], np.cumsum(img_n[d])[:-1]])
            ebegins = np.concatenate([[0], np.cumsum(ecount[d])])
            for j in range(bl):
                w0, w1 = int(begins[j]), int(begins[j] + img_n[d, j])
                header = np.asarray(
                    [np.uint32(nl) | fmt_flags, w1 - w0, int(ecount[d, j])],
                    np.uint32).tobytes()
                body = bufs[d, w0:w1].tobytes()
                if len(body) % 4:
                    body += b"\x00\x00"
                y_strings.append(
                    header + body + ebufs[d, ebegins[j]:ebegins[j + 1]]
                    .astype(np.int32).tobytes())
        return y_strings, extra

    def compress_end(self, h: dict) -> dict:
        """Host half: one combined fetch, per-image stream assembly
        (format v4 by default; v3 with separate z strings under
        MLIC_UNIFIED_Z=0)."""
        from mlic_tpu.entropy.rans.coder import _V3_FLAG, _V4_FLAG
        t0, batch, z_qs = h["t0"], h["batch"], h["z_qs"]
        if self.unified_z:
            y_strings, _ = self._fetch_shard_streams(
                h["rans"], batch, _V3_FLAG | _V4_FLAG)
            res = {"strings": [y_strings, [b""] * batch],
                   "shape": h["zshape"],
                   "cost_time": time.perf_counter() - t0}
            if self.encode_recon:
                res["x_hat"] = h["x_hat"]
            return res
        y_strings, (flags, z16) = self._fetch_shard_streams(
            h["rans"], batch, _V3_FLAG, extra_fetch=(h["flags"], h["z16"]))
        flags = np.asarray(flags).reshape(self.n_dev, -1).any(axis=0)
        if flags[0] or flags[2]:
            raise NotImplementedError(
                "symbol/z overflow (untrained/degenerate latents) is not "
                "supported by the sharded serving path; use Codec")
        z_np = np.asarray(z16).astype(np.int32)
        z_strings = self._encode_z(z_np, z_qs, batch)
        res = {"strings": [y_strings, z_strings],
               "shape": (int(z_np.shape[1]), int(z_np.shape[2])),
               "cost_time": time.perf_counter() - t0}
        if self.encode_recon:
            res["x_hat"] = h["x_hat"]
        return res

    def compress(self, x, s: int = 0, inputscale: float = 0.0) -> dict:
        return self.compress_end(self.compress_begin(x, s, inputscale))

    # ------------------------------------------------------------------
    def decompress(self, strings, shape, s: int = 0, inputscale: float = 0.0,
                   wait: bool = True) -> dict:
        self._require_tables()
        t0 = time.perf_counter()
        scale = self._scale_for(s, inputscale)
        z_qs = self._z_qs_for(s, inputscale)
        y_strings, z_strings = strings
        batch = len(y_strings)
        nd = self.n_dev
        assert batch % nd == 0, f"batch {batch} not divisible by {nd} devices"
        bl = batch // nd
        zh, zw = shape
        n_ch = self.model.cfg.N

        from mlic_tpu.entropy.rans.coder import parse_global, stream_is_unified

        unified = stream_is_unified(y_strings[0])
        if unified and not self.unified_z:
            raise ValueError(
                "format-v4 stream (inline z) but this codec was built "
                "with MLIC_UNIFIED_Z=0")
        if not unified:
            z_symbols = self._decode_z_host(z_strings, z_qs, batch, zh, zw,
                                            n_ch)
            zdt = (np.int16 if np.abs(z_symbols).max(initial=0) <= 32767
                   else np.int32)

        # Per-shard word/escape buffers with SHARD-LOCAL offsets: inside
        # shard_map each device sees only its own [bucket] slice, so every
        # pointer is relative to it.
        per = [[parse_global(y_strings[d * bl + j]) for j in range(bl)]
               for d in range(nd)]
        wmax = max(sum(len(w) for _, w, _ in shard) for shard in per)
        emax = max(sum(len(e) for _, _, e in shard) for shard in per)
        self._sh_dec_words = max(getattr(self, "_sh_dec_words", 0),
                                 _bucket(wmax))
        self._sh_dec_esc = max(getattr(self, "_sh_dec_esc", 0),
                               _bucket(max(emax, 1), minimum=1024))
        words = np.zeros((nd, self._sh_dec_words), np.uint16)
        escv = np.zeros((nd, self._sh_dec_esc), np.int32)
        img_begin = np.zeros((nd, bl), np.int32)
        esc_begin = np.zeros((nd, bl), np.int32)
        for d in range(nd):
            woff = eoff = 0
            for j, (snl, wds, esc) in enumerate(per[d]):
                assert snl == self.n_lanes, (
                    f"stream has {snl} lanes, codec built for {self.n_lanes}")
                words[d, woff:woff + len(wds)] = wds
                img_begin[d, j] = woff
                woff += len(wds)
                escv[d, eoff:eoff + len(esc)] = esc
                esc_begin[d, j] = eoff
                eoff += len(esc)

        if unified:
            key = (zh, zw, self._dev_n_steps, self._z_steps_row)
            dec = self._dec_sharded_v4.get(key)
            if dec is None:
                dec = self._dec_sharded_v4[key] = self._make_dec_sharded_v4(
                    *key)
            x_hat, y_hat = dec(
                self.params, jnp.asarray(words.reshape(-1)),
                jnp.asarray(img_begin.reshape(-1)),
                self._dev_tables_for(z_qs), jnp.asarray(scale, jnp.float32),
                jnp.asarray(z_qs, jnp.float32), jnp.asarray(escv.reshape(-1)),
                jnp.asarray(esc_begin.reshape(-1)))
        else:
            if (self._dec_sharded is None
                    or self._dec_sharded_steps != self._dev_n_steps):
                self._dec_sharded = self._make_dec_sharded(self._dev_n_steps)
                self._dec_sharded_steps = self._dev_n_steps
            x_hat, y_hat = self._dec_sharded(
                self.params, jnp.asarray(z_symbols.astype(zdt)),
                jnp.asarray(words.reshape(-1)),
                jnp.asarray(img_begin.reshape(-1)), self._dev_tables,
                jnp.asarray(scale, jnp.float32),
                jnp.asarray(z_qs, jnp.float32),
                jnp.asarray(escv.reshape(-1)),
                jnp.asarray(esc_begin.reshape(-1)))
        if wait:
            jax.block_until_ready(x_hat)
        return {"x_hat": x_hat, "y_hat": y_hat,
                "cost_time": time.perf_counter() - t0}
