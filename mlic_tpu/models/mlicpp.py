"""MLIC++: linear-complexity multi-reference entropy model codec, TPU-native.

Reimplements the reference ``MLIC++/models/mlicpp.py`` (MLICPlusPlus) as a
Flax module in NHWC with three entry points:

* ``__call__`` — the training forward (noise-quantized z likelihoods, STE
  rounding, per-slice checkerboard + channel + global contexts); mirrors
  reference ``mlicpp.py:79-185``.
* ``codec_pass`` — the real-coding program shared by BOTH compress and
  decompress.  The reference runs the same eager module calls in its
  ``compress``/``decompress`` loops (``mlicpp.py:199-378``); under XLA we
  get the equivalent guarantee by compiling ONE program whose per-phase
  symbol exchange happens through an ordered host callback: in encode mode
  the host buffers the device-computed symbols for rANS packing, in decode
  mode it returns rANS-decoded symbols.  Same compiled executable ⇒ the
  entropy parameters computed on the encode and decode side are bit-exact.
* ``net_decoder_forward`` — decode-complexity proxy (``mlicpp.py:380-459``)
  used for MACs accounting.

Unlike the reference there is no ``update_resolutions`` statefulness: the
checkerboard attention mask is derived from iota inside the traced program
(see ``models/context.py``) and shapes are static per compiled graph.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import io_callback

from mlic_tpu.entropy.cdf import get_scale_table
from mlic_tpu.entropy.models import EntropyBottleneck, build_indexes, gaussian_likelihood
from mlic_tpu.models.config import ModelConfig
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
from mlic_tpu.ops.math import (
    ckbd_anchor,
    ckbd_anchor_squeeze,
    ckbd_anchor_unsqueeze,
    ckbd_nonanchor,
    ckbd_nonanchor_squeeze,
    ckbd_nonanchor_unsqueeze,
    ckbd_split,
    quantize_ste,
)

Exchange = Callable[..., jax.Array]


class MLICPlusPlus(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        N, M, S, C = cfg.N, cfg.M, cfg.slice_num, cfg.slice_ch
        dw = cfg.depthwise
        # Small-decoder variant (reference mlicpp_small_decoder.py:12-43):
        # dense-conv encoder (analysis_old), depthwise N//4-wide synthesis,
        # hyper-synthesis shrunk to M//4, dense channel context with
        # hidden=(96,96), wide ("Old") depthwise LRP.
        enc_dw = dw and not cfg.small_decoder
        dec_N = N // 4 if cfg.small_decoder else N
        hyper_M = M // 4 if cfg.small_decoder else M

        # "bfloat16_mixed": bf16 transforms with the mixed-GDN policy (the
        # x^2 @ gamma MXU contraction in bf16 w/ f32 accumulation instead of
        # casting activations f32 around every GDN — see layers.GDN).
        tdn = cfg.transform_dtype
        mixed = tdn == "bfloat16_mixed"
        tdt = (None if tdn == "float32"
               else jnp.bfloat16 if mixed else jnp.dtype(tdn))
        gdt = tdt if mixed else None
        self.g_a = AnalysisTransform(N=N, M=M, depthwise=enc_dw, dtype=tdt,
                                     gdn_dtype=gdt)
        self.h_a = HyperAnalysis(M=M, N=N, depthwise=enc_dw, dtype=tdt)
        self.g_s = SynthesisTransform(N=dec_N, M=M, depthwise=dw,
                                      old_head=cfg.old_synthesis, dtype=tdt,
                                      gdn_dtype=gdt)
        # h_s feeds the entropy parameters: stays float32 for coding
        # determinism regardless of transform_dtype.
        self.h_s = HyperSynthesis(M=hyper_M, N=N, depthwise=dw)
        self.entropy_bottleneck = self._make_entropy_bottleneck(N)

        ch_hidden = (96, 96) if cfg.small_decoder else (192, 128)
        ch_dw = dw and not cfg.small_decoder  # context_old in SD
        self.local_context = [
            LocalContext(dim=C, window_size=cfg.context_window, name=f"local_{i}")
            for i in range(S)]
        self.channel_context = [
            ChannelContext(out_dim=C, hidden=ch_hidden, depthwise=ch_dw,
                           name=f"chctx_{i}")
            for i in range(1, S)]
        self.global_inter_context = [
            LinearGlobalInterContext(dim=C * i, out_dim=C * 2,
                                     num_heads=max(C * i // 32, 1),
                                     name=f"ginter_{i}")
            for i in range(1, S)]
        self.global_intra_context = [
            LinearGlobalIntraContext(dim=C, name=f"gintra_{i}")
            for i in range(1, S)]
        self.entropy_parameters_anchor = [
            EntropyParameters(out_dim=C * 2, name=f"ep_anchor_{i}") for i in range(S)]
        self.entropy_parameters_nonanchor = [
            EntropyParameters(out_dim=C * 2, name=f"ep_nonanchor_{i}") for i in range(S)]
        lrp_old = cfg.small_decoder  # LatentResidualPredictionOld in SD
        self.lrp_anchor = [
            LatentResidualPrediction(out_dim=C, depthwise=dw, old_wide=lrp_old,
                                     in_dim=hyper_M + (i + 1) * C,
                                     name=f"lrp_anchor_{i}")
            for i in range(S)]
        self.lrp_nonanchor = [
            LatentResidualPrediction(out_dim=C, depthwise=dw, old_wide=lrp_old,
                                     in_dim=hyper_M + (i + 1) * C,
                                     name=f"lrp_nonanchor_{i}")
            for i in range(S)]

        self.scale_table = jnp.asarray(get_scale_table(), jnp.float32)

    def _make_entropy_bottleneck(self, channels: int):
        """Hook: the VBR subclass swaps in ``EntropyBottleneckVbr`` when
        ``cfg.vr_entbttlnck`` (reference ``mlicpp_vbr.py:104-117``)."""
        return EntropyBottleneck(channels=channels)

    # ---------------- shared per-slice context helpers -----------------
    def _slice_ctx(self, idx: int, y_hat_slices):
        if idx == 0:
            return None, None
        prev = jnp.concatenate(y_hat_slices, axis=-1)
        inter = self.global_inter_context[idx - 1](prev)
        channel = self.channel_context[idx - 1](prev)
        return inter, channel

    def _anchor_params(self, idx, hyper_params, inter_ctx, channel_ctx):
        if idx == 0:
            return self.entropy_parameters_anchor[0](hyper_params)
        fused = jnp.concatenate([inter_ctx, channel_ctx, hyper_params], axis=-1)
        return self.entropy_parameters_anchor[idx](fused)

    def _nonanchor_params(self, idx, hyper_params, local_ctx, intra_ctx,
                          inter_ctx, channel_ctx):
        if idx == 0:
            fused = jnp.concatenate([local_ctx, hyper_params], axis=-1)
        else:
            fused = jnp.concatenate(
                [local_ctx, intra_ctx, inter_ctx, channel_ctx, hyper_params], axis=-1)
        return self.entropy_parameters_nonanchor[idx](fused)

    def _lrp(self, branch, idx, hyper_means, y_hat_slices, current):
        inp = jnp.concatenate([hyper_means] + list(y_hat_slices) + [current], axis=-1)
        return branch[idx](inp)

    @staticmethod
    def _chunk2(params):
        return jnp.split(params, 2, axis=-1)

    # --------------------------- training ------------------------------
    def __call__(self, x, training: bool = True):
        """x: [B,H,W,3] in [0,1] -> dict with x_hat and y/z likelihoods."""
        cfg = self.cfg
        C = cfg.slice_ch
        y = self.g_a(x)
        z = self.h_a(y)
        _, z_likelihoods = self.entropy_bottleneck(z, training)
        z_hat = self.entropy_bottleneck.ste_quantize(z)

        hyper_params = self.h_s(z_hat)
        _, hyper_means = self._chunk2(hyper_params)

        y_hat_slices = []
        y_lks = []
        for idx in range(cfg.slice_num):
            y_slice = y[..., idx * C:(idx + 1) * C]
            slice_anchor, slice_nonanchor = ckbd_split(y_slice)
            inter_ctx, channel_ctx = self._slice_ctx(idx, y_hat_slices)

            params_anchor = self._anchor_params(idx, hyper_params, inter_ctx, channel_ctx)
            scales_a, means_a = self._chunk2(params_anchor)
            scales_a, means_a = ckbd_anchor(scales_a), ckbd_anchor(means_a)
            slice_anchor = quantize_ste(slice_anchor - means_a) + means_a
            lrp_a = self._lrp(self.lrp_anchor, idx, hyper_means, y_hat_slices, slice_anchor)
            slice_anchor = slice_anchor + ckbd_anchor(lrp_a)

            local_ctx = self.local_context[idx](slice_anchor)
            intra_ctx = (self.global_intra_context[idx - 1](y_hat_slices[-1], slice_anchor)
                         if idx else None)
            params_na = self._nonanchor_params(idx, hyper_params, local_ctx, intra_ctx,
                                               inter_ctx, channel_ctx)
            scales_na, means_na = self._chunk2(params_na)
            scales_na, means_na = ckbd_nonanchor(scales_na), ckbd_nonanchor(means_na)

            scales_slice = scales_a + scales_na
            means_slice = means_a + means_na
            y_lks.append(gaussian_likelihood(y_slice, scales_slice, means_slice))

            slice_nonanchor = quantize_ste(slice_nonanchor - means_na) + means_na
            y_hat_slice = slice_anchor + slice_nonanchor
            lrp_na = self._lrp(self.lrp_nonanchor, idx, hyper_means, y_hat_slices, y_hat_slice)
            y_hat_slice = y_hat_slice + ckbd_nonanchor(lrp_na)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self.g_s(y_hat)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": jnp.concatenate(y_lks, axis=-1), "z": z_likelihoods},
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()

    # ------------------------- analysis only ---------------------------
    def analyze(self, x, z_qs=1.0):
        """Encoder front half: x -> (y, z_symbols) for the codec driver.
        Accepts uint8 images (scaled by 1/255) to keep the host->device
        transfer at 1 byte/channel.  ``z_qs`` is the hyper-latent
        quantization step (1.0 except for VBR models with a variable-rate
        bottleneck)."""
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        y = self.g_a(x)
        z = self.h_a(y)
        medians = self.entropy_bottleneck.medians().reshape(1, 1, 1, -1)
        z_symbols = jnp.round((z - medians) / jnp.asarray(z_qs, jnp.float32))
        return y, z_symbols.astype(jnp.int32)

    def _z_hat(self, z_symbols, z_qs):
        """Decoder-side hyper-latent reconstruction from coded symbols."""
        medians = self.entropy_bottleneck.medians().reshape(1, 1, 1, -1)
        return z_symbols.astype(jnp.float32) * jnp.asarray(z_qs, jnp.float32) + medians

    # ------------------------- real coding -----------------------------
    #
    # Two interchangeable backends share the SAME per-phase math:
    #  * codec_pass — ONE compiled program with ordered io_callbacks (fused;
    #    fastest where host callbacks are supported).
    #  * codec_begin/codec_step_anchor/codec_step_nonanchor/codec_finish —
    #    per-slice compiled steps driven from Python with explicit
    #    host<->device transfers.  Encode and decode run the *same compiled
    #    executables* in both backends, so entropy parameters are bit-exact
    #    across the two coding directions either way.
    #
    # ``scale`` is the VBR gain (1.0 for fixed-rate models): symbols are
    # round((v - mu) * scale), reconstruction is sym * (1/scale) + mu, and
    # CDF rows are looked up at sigma * scale (reference mlicpp_vbr.py:277).

    def _phase_quantities(self, squeeze, y_slice, scales, means, scale):
        sc_sq = squeeze(scales)
        mu_sq = squeeze(means)
        # uint8 indexes: the scale table has 64 rows; 4x smaller downloads.
        indexes = build_indexes(sc_sq * scale, self.scale_table).astype(jnp.uint8)
        cand = jnp.round((squeeze(y_slice) - mu_sq) * scale).astype(jnp.int32)
        return mu_sq, sc_sq, indexes, cand

    def _phase_recon(self, symbols, mu_sq, sc_sq, scale):
        """Reconstruct a squeezed phase from its integer symbols.  The VBR
        subclass applies the QuantABCD dead-zone offset here when
        ``cfg.quant_offset`` (reference ``utils/ckbd.py:146-193`` intent);
        inputs are identical on the encode and decode side, so the offset
        round-trips bit-exactly."""
        del sc_sq
        return symbols.astype(jnp.float32) * (1.0 / scale) + mu_sq

    def _empty_codec_state(self, b, h, w):
        cfg = self.cfg
        C = cfg.slice_ch
        hyper_ch = 2 * (cfg.M // 4 if cfg.small_decoder else cfg.M)
        f32 = jnp.float32
        return {
            "hyper_params": jnp.zeros((b, h, w, hyper_ch), f32),
            "y_buf": jnp.zeros((b, h, w, cfg.M), f32),
            "slice_anchor": jnp.zeros((b, h, w, C), f32),
            "means_sq": jnp.zeros((b, h, w // 2, C), f32),
            "scales_sq": jnp.zeros((b, h, w // 2, C), f32),
            "inter_ctx": jnp.zeros((b, h, w, 2 * C), f32),
            "channel_ctx": jnp.zeros((b, h, w, 4 * C), f32),
            "scale": jnp.ones((), f32),
        }

    def gain_scale(self, s=0, inputscale=0.0):
        """Coding-time quantization scale; 1.0 unless the VBR subclass
        overrides (Gain gather)."""
        return jnp.ones((), jnp.float32)

    def z_step(self, s=0, inputscale=0.0):
        """Hyper-latent quantization step; 1.0 unless the VBR subclass has a
        variable-rate bottleneck (``gayn2zqstep``, reference
        ``mlicpp_vbr.py:104-117``)."""
        return jnp.ones((), jnp.float32)

    def codec_begin(self, y, z_symbols, scale, z_qs=1.0):
        """Start a codec run: hyper path + anchor params of slice 0.

        Returns (state, indexes_sq, candidate_symbols_sq)."""
        z_hat = self._z_hat(z_symbols, z_qs)
        hyper_params = self.h_s(z_hat)
        b, h, w, _ = y.shape
        state = self._empty_codec_state(b, h, w)
        state["hyper_params"] = hyper_params
        state["scale"] = jnp.asarray(scale, jnp.float32)
        params_anchor = self._anchor_params(0, hyper_params, None, None)
        scales_a, means_a = self._chunk2(params_anchor)
        mu_sq, sc_sq, indexes, cand = self._phase_quantities(
            ckbd_anchor_squeeze, y[..., :self.cfg.slice_ch], scales_a, means_a,
            state["scale"])
        state["means_sq"] = mu_sq
        state["scales_sq"] = sc_sq
        return state, indexes, cand

    def _buf_slices(self, state, idx):
        C = self.cfg.slice_ch
        return [state["y_buf"][..., i * C:(i + 1) * C] for i in range(idx)]

    def codec_step_anchor(self, y, state, symbols, idx: int):
        """Apply decoded anchor symbols of slice ``idx``; emit non-anchor
        phase quantities.  Returns (state, indexes_sq, cand_sq)."""
        cfg = self.cfg
        C = cfg.slice_ch
        scale = state["scale"]
        hyper_params = state["hyper_params"]
        _, hyper_means = self._chunk2(hyper_params)
        y_hat_slices = self._buf_slices(state, idx)

        slice_anchor = ckbd_anchor_unsqueeze(self._phase_recon(
            symbols, state["means_sq"], state["scales_sq"], scale))
        lrp_a = self._lrp(self.lrp_anchor, idx, hyper_means, y_hat_slices, slice_anchor)
        slice_anchor = slice_anchor + ckbd_anchor(lrp_a)

        local_ctx = self.local_context[idx](slice_anchor)
        intra_ctx = (self.global_intra_context[idx - 1](y_hat_slices[-1], slice_anchor)
                     if idx else None)
        inter_ctx = state["inter_ctx"] if idx else None
        channel_ctx = state["channel_ctx"] if idx else None
        params_na = self._nonanchor_params(idx, hyper_params, local_ctx, intra_ctx,
                                           inter_ctx, channel_ctx)
        scales_na, means_na = self._chunk2(params_na)
        mu_sq, sc_sq, indexes, cand = self._phase_quantities(
            ckbd_nonanchor_squeeze, y[..., idx * C:(idx + 1) * C],
            scales_na, means_na, scale)
        state = dict(state, slice_anchor=slice_anchor, means_sq=mu_sq,
                     scales_sq=sc_sq)
        return state, indexes, cand

    def codec_step_nonanchor(self, y, state, symbols, idx: int):
        """Complete slice ``idx``; emit anchor phase quantities for
        slice ``idx+1`` (zeros after the last slice)."""
        cfg = self.cfg
        C = cfg.slice_ch
        scale = state["scale"]
        hyper_params = state["hyper_params"]
        _, hyper_means = self._chunk2(hyper_params)
        y_hat_slices = self._buf_slices(state, idx)

        slice_nonanchor = ckbd_nonanchor_unsqueeze(self._phase_recon(
            symbols, state["means_sq"], state["scales_sq"], scale))
        y_hat_slice = slice_nonanchor + state["slice_anchor"]
        lrp_na = self._lrp(self.lrp_nonanchor, idx, hyper_means, y_hat_slices,
                           y_hat_slice)
        y_hat_slice = y_hat_slice + ckbd_nonanchor(lrp_na)
        y_buf = jax.lax.dynamic_update_slice_in_dim(
            state["y_buf"], y_hat_slice, idx * C, axis=3)
        state = dict(state, y_buf=y_buf)

        nxt = idx + 1
        if nxt < cfg.slice_num:
            y_hat_slices = self._buf_slices(state, nxt)
            inter_ctx, channel_ctx = self._slice_ctx(nxt, y_hat_slices)
            params_anchor = self._anchor_params(nxt, hyper_params, inter_ctx, channel_ctx)
            scales_a, means_a = self._chunk2(params_anchor)
            mu_sq, sc_sq, indexes, cand = self._phase_quantities(
                ckbd_anchor_squeeze, y[..., nxt * C:(nxt + 1) * C],
                scales_a, means_a, scale)
            state = dict(state, means_sq=mu_sq, scales_sq=sc_sq,
                         inter_ctx=inter_ctx, channel_ctx=channel_ctx)
        else:
            indexes = jnp.zeros_like(state["means_sq"], jnp.int32)
            cand = jnp.zeros_like(indexes)
        return state, indexes, cand

    def codec_finish(self, state):
        y_hat = state["y_buf"]
        return self.g_s(y_hat), y_hat

    def codec_pass(self, y, z_symbols, exchange: Exchange, scale=1.0, z_qs=1.0):
        """Fused compress/decompress program (see module docstring).

        Args:
          y: [B,h,w,M] latent from ``analyze`` (zeros when decoding).
          z_symbols: int32 [B,h/4,w/4,N] quantized hyper-latent symbols.
          exchange: host callback ``(tag, indexes_sq, candidate_symbols) ->
            symbols`` invoked once per (slice, phase) in coding order.
        Returns:
          (x_hat, y_hat)
        """
        cfg = self.cfg
        C = cfg.slice_ch
        scale = jnp.asarray(scale, jnp.float32)
        z_hat = self._z_hat(z_symbols, z_qs)
        hyper_params = self.h_s(z_hat)
        _, hyper_means = self._chunk2(hyper_params)

        def phase(tag, squeeze, unsqueeze, y_slice, scales, means):
            """One checkerboard phase: device params -> host symbols -> ŷ half."""
            mu_sq, sc_sq, indexes, cand = self._phase_quantities(
                squeeze, y_slice, scales, means, scale)
            symbols = io_callback(
                functools.partial(exchange, tag),
                jax.ShapeDtypeStruct(cand.shape, jnp.int32),
                indexes, cand, ordered=True)
            return unsqueeze(self._phase_recon(symbols, mu_sq, sc_sq, scale))

        y_hat_slices = []
        for idx in range(cfg.slice_num):
            y_slice = y[..., idx * C:(idx + 1) * C]
            inter_ctx, channel_ctx = self._slice_ctx(idx, y_hat_slices)

            params_anchor = self._anchor_params(idx, hyper_params, inter_ctx, channel_ctx)
            scales_a, means_a = self._chunk2(params_anchor)
            slice_anchor = phase(f"a{idx}", ckbd_anchor_squeeze, ckbd_anchor_unsqueeze,
                                 y_slice, scales_a, means_a)
            lrp_a = self._lrp(self.lrp_anchor, idx, hyper_means, y_hat_slices, slice_anchor)
            slice_anchor = slice_anchor + ckbd_anchor(lrp_a)

            local_ctx = self.local_context[idx](slice_anchor)
            intra_ctx = (self.global_intra_context[idx - 1](y_hat_slices[-1], slice_anchor)
                         if idx else None)
            params_na = self._nonanchor_params(idx, hyper_params, local_ctx, intra_ctx,
                                               inter_ctx, channel_ctx)
            scales_na, means_na = self._chunk2(params_na)
            slice_nonanchor = phase(f"n{idx}", ckbd_nonanchor_squeeze,
                                    ckbd_nonanchor_unsqueeze, y_slice, scales_na, means_na)
            y_hat_slice = slice_nonanchor + slice_anchor
            lrp_na = self._lrp(self.lrp_nonanchor, idx, hyper_means, y_hat_slices,
                               y_hat_slice)
            y_hat_slice = y_hat_slice + ckbd_nonanchor(lrp_na)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self.g_s(y_hat)
        return x_hat, y_hat

    def codec_device_pass(self, z_symbols, words, img_begin, tables,
                          scale, n_lanes: int, n_steps: int = 12, z_qs=1.0,
                          esc_values=None, esc_begin=None):
        """Single-program decompress with ON-DEVICE interleaved rANS.

        The reference crosses device->host twice per slice to run its C++
        rANS (``mlicpp.py:292-378``); here the bitstream (16-bit words of
        ``n_lanes`` lockstep rans16 lanes per image) is uploaded once and
        decoded inside the jitted program by ``entropy.device_rans`` —
        zero host involvement on the critical path.

        Args:
          z_symbols: int16 (or int32) [B,h/4,w/4,N]; int16 halves the upload.
          words: uint16 [W] concatenated stream words (all images); widened
            to int32 on device — the axon tunnel uploads at ~32 MB/s, so
            buffer bytes are latency.
          img_begin: int32 [B] per-image word-block offsets into ``words``
            (stream format v3, global emission order — no per-lane begin
            table exists; ``entropy/rans/coder.py`` ``encode_global``).
          tables: decode-table dict — ``device_rans.parametric_device_tables``
            (gather-free analytic cdf path) or ``device_rans.device_tables``
            (LUT fallback) — built WITH the extra pad row appended
            (row id = n_rows-1).
          scale: VBR gain (1.0 fixed-rate).
          n_steps: static bisection depth for the parametric path.
          esc_values/esc_begin: int32 escape side channel (concatenated
            values + per-image offsets).
        Returns: (x_hat, y_hat)
        """
        from mlic_tpu.entropy.device_rans import make_decoder

        words = words.astype(jnp.int32)          # one VPU pass, upload stays 2B/word
        z_symbols = z_symbols.astype(jnp.int32)
        init, decode = make_decoder(words, n_steps, esc_values, esc_begin,
                                    fmt="global", n_lanes=n_lanes)
        carry = init(img_begin)
        return self._device_pass_from_z(z_symbols, carry, decode, tables,
                                        scale, n_lanes, z_qs)

    def codec_device_pass_v4(self, zh: int, zw: int, words, img_begin,
                             tables, scale, n_lanes: int, n_steps: int,
                             z_steps_row: int, z_rows_base: int, z_qs=1.0,
                             esc_values=None, esc_begin=None):
        """Format-v4 decompress: the hyper-latent z is DECODED FROM THE
        STREAM on device (integer-row bisection over the factorized-prior
        CDF rows appended to ``tables['cdf_rows']`` at row ids >=
        ``z_rows_base``), then the usual context/y pass runs — zero host
        entropy coding in either direction.

        Args (static): zh, zw — z spatial dims (``shape`` in the container);
        z_steps_row — bisection depth for the factorized rows;
        z_rows_base — first factorized row id in the combined table.
        """
        from mlic_tpu.entropy.device_rans import make_decoder

        cfg = self.cfg
        N = cfg.N
        b = img_begin.shape[0]
        pad_row = z_rows_base - 1
        words = words.astype(jnp.int32)
        init, decode = make_decoder(words, n_steps, esc_values, esc_begin,
                                    fmt="global", n_lanes=n_lanes)
        carry = init(img_begin)
        # z section first (position order matches the encoder's phase order).
        z_n = zh * zw * N
        z_rows = z_rows_base + (
            jnp.arange(z_n, dtype=jnp.int32) % N)        # NHWC ravel: ch = pos % N
        steps = -(-z_n // n_lanes)
        pad = steps * n_lanes - z_n
        flat = jnp.broadcast_to(z_rows[None], (b, z_n))
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=pad_row)
        ordered = flat.reshape(b, steps, n_lanes).transpose(1, 0, 2).reshape(-1)
        z_view = {k: tables[k] for k in ("cdf_rows", "max_value", "offsets")}
        carry, z_sym = decode(carry, ordered, z_view, n_steps_row=z_steps_row)
        z_sym = (z_sym.reshape(steps, b, n_lanes).transpose(1, 0, 2)
                 .reshape(b, -1)[:, :z_n])
        z_symbols = z_sym.reshape(b, zh, zw, N)
        return self._device_pass_from_z(z_symbols, carry, decode, tables,
                                        scale, n_lanes, z_qs)

    def _device_pass_from_z(self, z_symbols, carry, decode, tables, scale,
                            n_lanes: int, z_qs):
        """Shared context/y half of the device decompress: consume the
        remaining stream phases given already-decoded z symbols."""
        cfg = self.cfg
        C = cfg.slice_ch
        scale = jnp.asarray(scale, jnp.float32)
        pad_row = tables["row_params"].shape[0] - 1 if "row_params" in tables \
            else tables["lut_sf"].shape[0] - 1
        b = z_symbols.shape[0]

        z_hat = self._z_hat(z_symbols, z_qs)
        hyper_params = self.h_s(z_hat)
        _, hyper_means = self._chunk2(hyper_params)

        def phase(carry, squeeze, unsqueeze, scales, means):
            sc_sq = squeeze(scales)
            mu_sq = squeeze(means)
            idx = build_indexes(sc_sq * scale, self.scale_table)  # [B,h,w2,C]
            n_img = idx.shape[1] * idx.shape[2] * idx.shape[3]
            steps = -(-n_img // n_lanes)  # ceil
            pad = steps * n_lanes - n_img
            flat = idx.reshape(b, n_img)
            flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=pad_row)
            # position order: step-major, image-major, lane-minor
            ordered = flat.reshape(b, steps, n_lanes).transpose(1, 0, 2).reshape(-1)
            pre_cols = None
            if "row_params" in tables:
                # Row-param lookup in the CANONICAL layout, each column
                # reordered once — the select chain on the transposed
                # `ordered` re-executes the transpose per select
                # (device_rans.prep_flat rationale).
                from mlic_tpu.entropy.device_rans import select_rows
                pre_cols = tuple(
                    c.reshape(b, steps, n_lanes).transpose(1, 0, 2)
                    .reshape(steps, b * n_lanes)
                    for c in select_rows(flat, tables["row_params"]))
            new_carry, sym = decode(carry, ordered, tables,
                                    pre_cols=pre_cols)
            sym = sym.reshape(steps, b, n_lanes).transpose(1, 0, 2).reshape(b, -1)
            sym = sym[:, :n_img].reshape(mu_sq.shape)
            return new_carry, unsqueeze(self._phase_recon(sym, mu_sq, sc_sq, scale))

        y_hat_slices = []
        for idx in range(cfg.slice_num):
            inter_ctx, channel_ctx = self._slice_ctx(idx, y_hat_slices)
            params_anchor = self._anchor_params(idx, hyper_params, inter_ctx, channel_ctx)
            scales_a, means_a = self._chunk2(params_anchor)
            carry, slice_anchor = phase(carry, ckbd_anchor_squeeze,
                                        ckbd_anchor_unsqueeze, scales_a, means_a)
            lrp_a = self._lrp(self.lrp_anchor, idx, hyper_means, y_hat_slices, slice_anchor)
            slice_anchor = slice_anchor + ckbd_anchor(lrp_a)

            local_ctx = self.local_context[idx](slice_anchor)
            intra_ctx = (self.global_intra_context[idx - 1](y_hat_slices[-1], slice_anchor)
                         if idx else None)
            params_na = self._nonanchor_params(idx, hyper_params, local_ctx, intra_ctx,
                                               inter_ctx, channel_ctx)
            scales_na, means_na = self._chunk2(params_na)
            carry, slice_nonanchor = phase(carry, ckbd_nonanchor_squeeze,
                                           ckbd_nonanchor_unsqueeze, scales_na, means_na)
            y_hat_slice = slice_nonanchor + slice_anchor
            lrp_na = self._lrp(self.lrp_nonanchor, idx, hyper_means, y_hat_slices,
                               y_hat_slice)
            y_hat_slice = y_hat_slice + ckbd_nonanchor(lrp_na)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        return self.g_s(y_hat), y_hat

    def codec_encode_pass(self, y, z_symbols, scale, z_qs=1.0,
                          with_recon: bool = True):
        """Pure (no-exchange) encode program: computes every phase's
        symbols/indexes in one jit.  The host packs the interleaved streams
        from two downloads (symbols, indexes) — no per-phase crossings.

        Numerical contract: the per-phase math is the same code as
        ``codec_device_pass``; cross-program bit-equality is asserted by the
        backend tests (and decode failures are detectable as reconstruction
        mismatch since the encoder also returns its x_hat).

        ``with_recon=False`` skips the encode-side g_s synthesis (x_hat is
        returned as None): the reference's ``compress`` never synthesizes
        either (``mlicpp.py:199-290``), and g_s is ~30 ms/batch of pure
        overhead when the caller only wants a bitstream (bench/serving).

        Returns (x_hat, y_hat, sym16 int16 [B,total], sym8 int8 [B,total],
        indexes_concat uint8 [B,total], flags int32 [3]) — the axon tunnel
        downloads at ~11 MB/s, so symbol bytes are the compress bottleneck;
        the driver downloads ``flags = [sym_over_int16, sym_over_int8,
        z_over_int16]`` first and then the narrowest safe representation
        (int8 for every trained model; int16 under random-init escapes;
        the int32 steps path only for degenerate latents).
        """
        cfg = self.cfg
        C = cfg.slice_ch
        scale = jnp.asarray(scale, jnp.float32)
        z_hat = self._z_hat(z_symbols, z_qs)
        hyper_params = self.h_s(z_hat)
        _, hyper_means = self._chunk2(hyper_params)

        syms, idxs = [], []

        def phase(squeeze, unsqueeze, y_slice, scales, means):
            mu_sq, sc_sq, indexes, cand = self._phase_quantities(
                squeeze, y_slice, scales, means, scale)
            syms.append(cand.reshape(cand.shape[0], -1))
            idxs.append(indexes.reshape(cand.shape[0], -1))  # uint8: slim download
            return unsqueeze(self._phase_recon(cand, mu_sq, sc_sq, scale))

        y_hat_slices = []
        for idx in range(cfg.slice_num):
            y_slice = y[..., idx * C:(idx + 1) * C]
            inter_ctx, channel_ctx = self._slice_ctx(idx, y_hat_slices)
            params_anchor = self._anchor_params(idx, hyper_params, inter_ctx, channel_ctx)
            scales_a, means_a = self._chunk2(params_anchor)
            slice_anchor = phase(ckbd_anchor_squeeze, ckbd_anchor_unsqueeze,
                                 y_slice, scales_a, means_a)
            lrp_a = self._lrp(self.lrp_anchor, idx, hyper_means, y_hat_slices, slice_anchor)
            slice_anchor = slice_anchor + ckbd_anchor(lrp_a)

            local_ctx = self.local_context[idx](slice_anchor)
            intra_ctx = (self.global_intra_context[idx - 1](y_hat_slices[-1], slice_anchor)
                         if idx else None)
            params_na = self._nonanchor_params(idx, hyper_params, local_ctx, intra_ctx,
                                               inter_ctx, channel_ctx)
            scales_na, means_na = self._chunk2(params_na)
            slice_nonanchor = phase(ckbd_nonanchor_squeeze, ckbd_nonanchor_unsqueeze,
                                    y_slice, scales_na, means_na)
            y_hat_slice = slice_nonanchor + slice_anchor
            lrp_na = self._lrp(self.lrp_nonanchor, idx, hyper_means, y_hat_slices,
                               y_hat_slice)
            y_hat_slice = y_hat_slice + ckbd_nonanchor(lrp_na)
            y_hat_slices.append(y_hat_slice)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        x_hat = self.g_s(y_hat) if with_recon else None
        sym32 = jnp.concatenate(syms, 1)
        amax = jnp.max(jnp.abs(sym32))
        flags = jnp.stack([amax > 32767, amax > 127,
                           jnp.max(jnp.abs(z_symbols)) > 32767]).astype(jnp.int32)
        return (x_hat, y_hat, sym32.astype(jnp.int16), sym32.astype(jnp.int8),
                jnp.concatenate(idxs, 1), flags, sym32)

    # --------------------- decode-complexity proxy ---------------------
    def net_decoder_forward(self, z_shape_source):
        """Decoder-only pass with zero hyper-latent and means-as-symbols,
        for MACs profiling (reference ``mlicpp.py:380-459``)."""
        cfg = self.cfg
        C = cfg.slice_ch
        b, h, w, _ = z_shape_source.shape
        z_hat = jnp.zeros((b, h // 64, w // 64, cfg.N), jnp.float32)
        hyper_params = self.h_s(z_hat)
        _, hyper_means = self._chunk2(hyper_params)
        y_hat_slices = []
        for idx in range(cfg.slice_num):
            inter_ctx, channel_ctx = self._slice_ctx(idx, y_hat_slices)
            params_anchor = self._anchor_params(idx, hyper_params, inter_ctx, channel_ctx)
            _, means_a = self._chunk2(params_anchor)
            slice_anchor = ckbd_anchor(means_a)
            lrp_a = self._lrp(self.lrp_anchor, idx, hyper_means, y_hat_slices, slice_anchor)
            slice_anchor = slice_anchor + ckbd_anchor(lrp_a)
            local_ctx = self.local_context[idx](slice_anchor)
            intra_ctx = (self.global_intra_context[idx - 1](y_hat_slices[-1], slice_anchor)
                         if idx else None)
            params_na = self._nonanchor_params(idx, hyper_params, local_ctx, intra_ctx,
                                               inter_ctx, channel_ctx)
            _, means_na = self._chunk2(params_na)
            slice_nonanchor = ckbd_nonanchor(means_na)
            y_hat_slice = slice_nonanchor + slice_anchor
            lrp_na = self._lrp(self.lrp_nonanchor, idx, hyper_means, y_hat_slices,
                               y_hat_slice)
            y_hat_slice = y_hat_slice + ckbd_nonanchor(lrp_na)
            y_hat_slices.append(y_hat_slice)
        return self.g_s(jnp.concatenate(y_hat_slices, axis=-1))
