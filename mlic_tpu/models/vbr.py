"""Variable-bitrate MLIC++ (reference ``MLIC++/models/mlicpp_vbr.py:14-1183``).

VBR machinery on top of the base model:
* learnable ``Gain`` vector (inverse quantization step per rate level,
  ``mlicpp_vbr.py:86-91``),
* ``QuantABCD`` 2->12->12->1 MLP mapping (stdev, gain) -> quantization offset
  (``:92-100``; only used when ``no_quantoffset=False`` — the fork default
  keeps it off, ``:102``),
* stage-2 forward with gain-scaled STE quantization
  ``ste_round((v-mu)*scale)*rescale + mu`` and likelihoods evaluated on the
  scaled triple ``(y*scale, sigma*scale, mu*scale)`` (``:277,292``).

TPU delta: the rate level ``s`` (and continuous ``inputscale``) are TRACED
scalars — ``scale = Gain[s]`` is a gather — so ONE compiled graph serves
every rate level, for training, eval, and real coding alike (the reference
re-runs Python branches per level).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlic_tpu.entropy.models import gaussian_likelihood
from mlic_tpu.models.mlicpp import MLICPlusPlus
from mlic_tpu.ops.math import (
    ckbd_anchor,
    ckbd_nonanchor,
    ckbd_split,
    lower_bound,
    quantize_ste,
)


class MLICPlusPlusVbr(MLICPlusPlus):

    def setup(self):
        super().setup()
        gain_init = jnp.asarray(self.cfg.gain_init, jnp.float32)
        self.Gain = self.param("Gain", lambda k, s: gain_init, gain_init.shape)
        # QuantABCD: Linear(2,12)-ReLU-Linear(12,12)-ReLU-Linear(12,1)
        self.quant_abcd = [nn.Dense(12, name="qabcd_0"),
                           nn.Dense(12, name="qabcd_1"),
                           nn.Dense(1, name="qabcd_2")]
        if self.cfg.vr_entbttlnck:
            # gayn2zqstep: Linear(1,10)-ReLU-Linear(10,10)-ReLU-Linear(10,1)
            # -Softplus, lower-bounded at 0.5 (reference mlicpp_vbr.py:104-117).
            self.gayn2zqstep = [nn.Dense(10, name="zqstep_0"),
                                nn.Dense(10, name="zqstep_1"),
                                nn.Dense(1, name="zqstep_2")]

    def _make_entropy_bottleneck(self, channels: int):
        from mlic_tpu.entropy.models import EntropyBottleneck, EntropyBottleneckVbr
        if self.cfg.vr_entbttlnck:
            return EntropyBottleneckVbr(channels=channels)
        return EntropyBottleneck(channels=channels)

    @property
    def levels(self) -> int:
        return len(self.cfg.lmbda)

    def quant_offset(self, stdev, scale):
        """QuantABCD forward: (bounded stdev, gain) -> offset."""
        inp = jnp.stack([stdev, jnp.broadcast_to(scale, stdev.shape)], axis=-1)
        h = nn.relu(self.quant_abcd[0](inp))
        h = nn.relu(self.quant_abcd[1](h))
        return self.quant_abcd[2](h)[..., 0]

    def _zqstep(self, scale):
        """Variable z quantization step from the gain (reference
        ``mlicpp_vbr.py:255-257``): lower_bound(softplus-MLP(1/scale), 0.5)."""
        inp = jnp.reshape(1.0 / scale, (1, 1))
        h = nn.relu(self.gayn2zqstep[0](inp))
        h = nn.relu(self.gayn2zqstep[1](h))
        q = jax.nn.softplus(self.gayn2zqstep[2](h))[0, 0]
        return lower_bound(q, 0.5)

    def z_step(self, s=0, inputscale=0.0):
        """Coding-time z quantization step (1.0 without ``vr_entbttlnck``)."""
        if not self.cfg.vr_entbttlnck:
            return jnp.ones((), jnp.float32)
        return self._zqstep(self.gain_scale(s, inputscale))

    def _phase_recon(self, symbols, mu_sq, sc_sq, scale):
        """QuantABCD dead-zone reconstruction in the REAL coding path
        (reference intent of ``utils/ckbd.py:76-121,146-193``: symbols are
        plain gain-scaled rounds; the decoder adds a learned magnitude
        offset, zeroed at zero-quantized positions).  Encode and decode
        compute this from bit-identical (mu, sigma, scale), so round trips
        stay exact."""
        if not self.cfg.quant_offset:
            return super()._phase_recon(symbols, mu_sq, sc_sq, scale)
        sym = symbols.astype(jnp.float32)
        q_stdev = lower_bound(sc_sq * scale, 0.11)
        offs = -self.quant_offset(q_stdev, scale)
        off = jnp.where(jnp.abs(sym) < 1e-4, 0.0, offs)
        return jnp.sign(sym) * (jnp.abs(sym) + off) * (1.0 / scale) + mu_sq

    def _scale(self, s, inputscale=None):
        """Gain gather with clipped traced index; inputscale overrides.

        Parity default (``train_gain=False``): stop-grad like the reference,
        whose forward detaches Gain (``mlicpp_vbr.py:126-132``).  With
        ``train_gain=True`` the gather stays differentiable so the MGDA
        trainer's per-level gain-grad sum actually trains the vector."""
        s = jnp.clip(jnp.asarray(s, jnp.int32), 0, len(self.cfg.gain_init) - 1)
        scale = jnp.abs(self.Gain[s])
        if not self.cfg.train_gain:
            scale = jax.lax.stop_gradient(scale)
        if inputscale is not None:
            scale = jnp.where(inputscale > 0, inputscale, scale)
        return scale

    def __call__(self, x, training: bool = True, stage: int = 2, s=1,
                 inputscale=None, quant_offset: bool | None = None):
        if stage == 1:
            return super().__call__(x, training)
        cfg = self.cfg
        C = cfg.slice_ch
        if quant_offset is None:
            quant_offset = cfg.quant_offset
        scale = self._scale(s, inputscale)
        rescale = 1.0 / scale
        # touch QuantABCD so its params exist regardless of the branch taken
        # at init time (linen materializes params lazily on first call)
        _ = self.quant_offset(jnp.ones((1,)), scale)

        y = self.g_a(x)
        z = self.h_a(y)
        if cfg.vr_entbttlnck:
            # Variable-rate hyper-latent: qs-grid quantization + qs-integrated
            # likelihoods; the quantized z_hat feeds h_s directly (reference
            # ``mlicpp_vbr.py:255-258`` uses the bottleneck output, not STE).
            z_qs = self._zqstep(scale)
            z_hat, z_likelihoods = self.entropy_bottleneck(z, training, qs=z_qs)
        else:
            _, z_likelihoods = self.entropy_bottleneck(z, training)
            z_hat = self.entropy_bottleneck.ste_quantize(z)
        hyper_params = self.h_s(z_hat)
        _, hyper_means = self._chunk2(hyper_params)

        if quant_offset:
            # QuantABCD dead-zone reconstruction (reference
            # ``mlicpp_vbr.py:337-520`` with ``no_quantoffset=False``).  The
            # reference's own branch contains non-functional tensor syntax
            # (e.g. ``q_offsets[-1e-4 < q_abs < 1e-4] = 0``,
            # ``utils/ckbd.py:112``); we implement the published intent:
            # x_hat = sign * (|round((v-mu)*scale)| + offset) / scale + mu,
            # offset = -QuantABCD(bounded sigma*scale, scale), zeroed where
            # the quantized magnitude is zero.
            def make_round(scales):
                q_stdev = lower_bound(scales * scale, 0.11)
                offs = -self.quant_offset(q_stdev, scale)

                def vbr_round(v, means):
                    zm = (v - means) * scale
                    q = quantize_ste(zm)
                    q_abs = jnp.abs(q)
                    off = jnp.where(q_abs < 1e-4, 0.0, offs)
                    return jnp.sign(zm) * (q_abs + off) * rescale + means
                return vbr_round
        else:
            def make_round(scales):
                def vbr_round(v, means):
                    return quantize_ste((v - means) * scale) * rescale + means
                return vbr_round

        y_hat_slices = []
        y_lks = []
        for idx in range(cfg.slice_num):
            y_slice = y[..., idx * C:(idx + 1) * C]
            slice_anchor, slice_nonanchor = ckbd_split(y_slice)
            inter_ctx, channel_ctx = self._slice_ctx(idx, y_hat_slices)

            params_anchor = self._anchor_params(idx, hyper_params, inter_ctx, channel_ctx)
            scales_a, means_a = self._chunk2(params_anchor)
            scales_a, means_a = ckbd_anchor(scales_a), ckbd_anchor(means_a)
            slice_anchor = make_round(scales_a)(slice_anchor, means_a)
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
            y_lks.append(gaussian_likelihood(y_slice * scale, scales_slice * scale,
                                             means_slice * scale))

            slice_nonanchor = make_round(scales_na)(slice_nonanchor, means_na)
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

    # ------------------------- real coding -----------------------------
    def gain_scale(self, s=0, inputscale=0.0):
        """Coding-time gain: ``abs(Gain[s])`` or a continuous ``inputscale``
        override (reference ``mlicpp_vbr.py:535,899``)."""
        s = jnp.clip(jnp.asarray(s, jnp.int32), 0, len(self.cfg.gain_init) - 1)
        scale = jnp.abs(self.Gain[s])
        inputscale = jnp.asarray(inputscale, jnp.float32)
        return jnp.where(inputscale > 0, inputscale, scale)

    def mmo_parameters(self):
        """Parameter-group labels for the multi-objective trainer: the Gain
        vector trains per-level, everything else is shared
        (reference ``mmo_parameters``, ``mlicpp_vbr.py:1138-1148``)."""
        return {"gain": ["Gain"], "shared": "rest"}
