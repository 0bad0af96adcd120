"""Codec driver: ties the jitted model programs to the host rANS coder.

Equivalent of the reference's ``compress``/``decompress``/``update`` methods
(``MLIC++/models/mlicpp.py:199-378,470-475``) restructured for TPU.

Two backends, both running the SAME compiled executables for encode and
decode (bit-exact entropy parameters by construction):

* ``steps`` (default): per-slice compiled step functions driven from
  Python, explicit host<->device transfers of packed int32 arrays — 2 per
  slice, like the reference, but array-sized instead of ``tolist()``.
  Works on every platform.
* ``fused``: ONE compiled program per direction-pair whose ordered
  ``io_callback``s exchange symbols in-graph.  Fewer dispatches; requires a
  platform with working host callbacks (CPU/GPU/standard TPU runtimes; the
  axon dev tunnel is NOT one of them).

``update`` rebuilds the integer CDF tables (factorized prior from the
learned quantiles, conditional Gaussian from the scale table) — all host
numpy, no device round-trips.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlic_tpu.entropy.cdf import get_scale_table
from mlic_tpu.entropy.models import (
    GaussianConditionalTables,
    entropy_bottleneck_tables,
)
from mlic_tpu.entropy.rans import (
    RansDecoder,
    decode_with_indexes,
    encode_with_indexes,
)
from mlic_tpu.models.mlicpp import MLICPlusPlus


def _bucket(n: int, minimum: int = 1 << 16, headroom: float = 1.25) -> int:
    """Pad a buffer length to the next power of 2 above ``n * headroom``:
    ONE decode-program shape per octave, chosen so streams hovering just
    under a boundary don't flip buckets batch-to-batch.  Finer buckets
    (quarter-pow2, round 1) saved <= 25% upload bytes but let consecutive
    batches straddle bucket boundaries, each flip costing a full XLA
    compile in the decode hot loop — measured 6.8 -> 0.8 img/s on the Kodak
    bench.  Upload waste is bounded by ~2.5x of the actual stream (sub-ms at
    trained-weight rates); a recompile is tens of seconds.  Callers also
    ratchet the result (never shrink) so a session converges to one shape."""
    n = max(int(n * headroom), minimum)
    return 1 << (max(n, 2) - 1).bit_length()


def _dl_bucket(n: int, minimum: int = 1 << 12) -> int:
    """Fine bucket (1/16-pow2 steps, ~3% headroom) for DOWNLOAD slices.

    Unlike the decode-side upload buffers — whose shape feeds the big
    device_pass executable, where a flip costs a full recompile (hence
    coarse pow2 buckets above) — a download slice only specializes a
    trivial copy program, so fine granularity is safe: at most 16 tiny
    compiles per octave, ratcheted.  Matters because the dev tunnel's
    bandwidth degrades to ~1 MB/s in bad phases: pow2 buckets download up
    to 2x the payload bytes."""
    n = max(int(n * 1.03), minimum)
    p = 1 << (max(n, 16) - 1).bit_length()
    step = p >> 4
    return ((n + step - 1) // step) * step


def auto_lanes(cfg, h: int, w: int, max_lanes: int = 256,
               min_lanes: int = 16, sym_per_lane: int = 64) -> int:
    """Size-adaptive rANS lane count (``Codec(n_lanes="auto")``).

    Interleaved-rANS state costs 4 B/lane/image (the only per-lane stream
    overhead left in format v3/v4), and every coding phase pads its
    symbols to a lane multiple — so small images want narrow codecs.
    Picks the largest power of two keeping >= ``sym_per_lane`` y symbols
    per lane, clamped to [``min_lanes``, ``max_lanes``]: at eval/bench
    sizes (>= ~256^2) this saturates at ``max_lanes`` (the historical
    fixed default — large-image behavior is unchanged), while a 64^2 tile
    drops to 16-32 lanes depending on M (16 for MLICPP_TINY, 32 for
    MLICPP_S), saving ~1 KB of state+padding on a sub-KB stream.  More lanes = shorter decode scans but more state overhead;
    throughput-tuned large-batch serving should keep passing an explicit
    count (bench.py uses 512)."""
    h64 = -(-int(h) // 64) * 64
    w64 = -(-int(w) // 64) * 64
    n_sym = (h64 // 16) * (w64 // 16) * cfg.M
    lanes = 1 << (max(n_sym // sym_per_lane, 1).bit_length() - 1)
    return max(min_lanes, min(max_lanes, lanes))


def make_analyze_fn(model):
    """g_a + h_a + z quantization, plus an int16 twin of z for the slim
    host download (guarded by the encode-pass z-overflow flag)."""
    cls = type(model)

    def _analyze_fn(p, x, zqs):
        y, z = model.apply({"params": p}, x, zqs, method=cls.analyze)
        return y, z, z.astype(jnp.int16)

    return _analyze_fn


def make_encode_rans(model, n_lanes: int, unified_z: bool = False,
                     z_rows_base: int = 0, analytic_rows: int = 0):
    """Stage-2 encode program: (start, freq) prep + phase_order layout +
    rANS scan + stream compaction, taking the context pass's symbol/index
    arrays as PROGRAM PARAMETERS.

    Run as its OWN dispatch this compiles the ~450-op select+erfc prep
    chain into a single fusion (4.4 ms/batch-8); inlined after the
    transform/context producers XLA shatters the same chain into ~1.9k
    materializing sub-fusions (141 ms — r4 HLO diff, identical op counts).
    Dispatch count is not the axon bottleneck (sync points are): the codec
    chains stage 1 and stage 2 asynchronously with one final fence.

    v4 (``unified_z``): signature (sym32, idx, z_flat, tables); the z
    section is prepped via the gather path (factorized-prior rows) ahead
    of the analytic y phases.  v3: signature (sym, idx, tables)."""
    from mlic_tpu.entropy.device_rans import (
        _PAD_FREQM1,
        _PAD_START,
        compact_streams_global,
        encode_interleaved_device,
        encode_scan_prepped,
        phase_order,
        prep_flat,
    )
    n_ph = 2 * model.cfg.slice_num

    if not unified_z:
        def _encode_rans_v3(sym, idx, tables):
            return encode_interleaved_device(sym, idx, tables, n_lanes,
                                             n_ph, fmt="global",
                                             analytic_rows=analytic_rows)
        return _encode_rans_v3

    def _encode_rans_v4(sym32, idx, z_flat, tables):
        # Prep (start/freq/escape) runs in the canonical [B, n] layout
        # BEFORE phase_order — see ``prep_flat``.  The z section
        # (factorized-prior rows) uses the gather path; the y phases the
        # analytic one.
        b = sym32.shape[0]
        N = model.cfg.N
        pad_row = z_rows_base - 1
        z_rows = z_rows_base + (
            jnp.arange(z_flat.shape[1], dtype=jnp.int32) % N)
        z_rows = jnp.broadcast_to(z_rows[None], z_flat.shape)
        st_z, fm_z, esc_z = prep_flat(z_flat, z_rows, tables, 0)
        st_y, fm_y, esc_y = prep_flat(sym32, idx, tables, analytic_rows)
        n_per = sym32.shape[1] // n_ph

        def parts(az, ay, pv):
            ps = [phase_order(az, n_lanes, pad_row, pv)]
            for k in range(n_ph):
                ps.append(phase_order(ay[:, k * n_per:(k + 1) * n_per],
                                      n_lanes, pad_row, pv))
            return jnp.concatenate(ps, 0)

        xs, words, emits = encode_scan_prepped(
            parts(st_z, st_y, _PAD_START), parts(fm_z, fm_y, _PAD_FREQM1))
        return compact_streams_global(
            xs, words, emits, parts(esc_z, esc_y, False),
            parts(z_flat, sym32, 0), b)

    return _encode_rans_v4


def make_encode_ctx(model, encode_recon: bool):
    """Stage-1 encode program: analyze + context pass, no entropy coding.
    Paired with ``make_encode_rans`` for the two-dispatch encode chain."""
    cls = type(model)
    analyze = make_analyze_fn(model)

    def _encode_ctx(p, x, sc, zqs):
        y, z_symbols, z16 = analyze(p, x, zqs)
        out = model.apply({"params": p}, y, z_symbols, sc, zqs,
                          encode_recon, method=cls.codec_encode_pass)
        x_hat, y_hat, sym16, sym8, idx, flags, sym32 = out
        return {"y": y, "z_symbols": z_symbols, "z16": z16,
                "x_hat": x_hat, "y_hat": y_hat, "sym16": sym16,
                "sym8": sym8, "idx": idx, "flags": flags, "sym32": sym32,
                "z_flat": z_symbols.reshape(sym32.shape[0], -1)}

    return _encode_ctx


def make_encode_full(model, n_lanes: int, encode_recon: bool,
                     unified_z: bool = False, z_rows_base: int = 0,
                     analytic_rows: int = 0):
    """ONE-dispatch encode program: analyze + context pass + device rANS.
    Factored out of ``Codec`` so the data-parallel serving path
    (``parallel/serving.py``) can wrap the same traced function in
    ``shard_map`` — each device runs the identical program on its batch
    shard.  (The local codec defaults to the two-dispatch chain instead —
    see ``make_encode_rans`` for why.)

    ``unified_z=True`` emits stream format v4: the hyper-latent's symbols
    are coded into the SAME interleaved stream as z-section phases ahead of
    the y phases (factorized-prior rows live at ids >= ``z_rows_base`` in
    the combined table) — no host entropy coding and no z-symbol transfers
    remain in either direction."""
    encode_ctx = make_encode_ctx(model, encode_recon)
    encode_rans = make_encode_rans(model, n_lanes, unified_z, z_rows_base,
                                   analytic_rows)

    def _encode_full(p, x, sc, zqs, tables):
        h = encode_ctx(p, x, sc, zqs)
        if unified_z:
            rans = encode_rans(h["sym32"], h["idx"], h["z_flat"], tables)
        else:
            rans = encode_rans(h["sym16"], h["idx"], tables)
        h = dict(h)
        del h["sym32"], h["z_flat"]
        h["rans"] = rans
        return h

    return _encode_full


class _ExchangeState:
    """Mutable host-side symbol-exchange state shared by both backends."""

    def __init__(self):
        self.mode = "idle"
        self.encoder_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self.decoders: list[RansDecoder] = []
        self.gc_cdfs = None
        self.gc_lengths = None
        self.gc_offsets = None

    def exchange(self, tag: str, indexes, candidate):
        """Per-phase symbol exchange; arrays carry a leading batch dim and
        each image owns its own stream (decoders list / per-image chunks).

        Decode mode never materializes ``candidate`` on the host — that
        download (round(0-mu), garbage when decoding) would double the
        per-phase transfer volume.
        """
        indexes = np.asarray(indexes).astype(np.int32)
        if self.mode == "encode":
            self.encoder_chunks.append((np.asarray(candidate), indexes))
            return candidate
        elif self.mode == "decode":
            outs = []
            for b, dec in enumerate(self.decoders):
                sym = dec.decode_stream(indexes[b].ravel(), self.gc_cdfs,
                                        self.gc_lengths, self.gc_offsets)
                outs.append(sym.reshape(indexes[b].shape))
            return np.stack(outs).astype(np.int32)
        raise RuntimeError(f"exchange called in mode {self.mode!r} (tag {tag})")


class Codec:
    """compress()/decompress() driver around a trained MLICPlusPlus."""

    def __init__(self, model: MLICPlusPlus, params: Any, backend: str = "steps",
                 n_lanes: int | str = "auto", encode_recon: bool = True):
        if backend not in ("steps", "fused", "device"):
            raise ValueError(f"unknown backend {backend!r}")
        if n_lanes != "auto":
            nl = int(n_lanes)
            if not 1 <= nl <= 4096 or nl & (nl - 1):
                # Streams are self-describing (the header leads with the
                # lane count) and decoders sanity-check it against this
                # same constraint — keep encoders and decoders agreeing.
                raise ValueError(
                    f"n_lanes must be a power of two in [1, 4096], got {nl}")
        self.model = model
        self.params = params
        self.backend = backend
        # "auto": lane count resolves at first use — from the image size
        # on compress (``auto_lanes``) or from the stream header on
        # decompress (streams are self-describing, so a decode-only codec
        # follows whatever width the encoder chose).
        self.n_lanes: Optional[int] = (None if n_lanes == "auto"
                                       else int(n_lanes))
        # encode_recon=False drops the encode-side g_s synthesis (and the
        # x_hat key from compress results) — the reference's compress never
        # synthesizes either; keep True where eval asserts enc/dec equality.
        self.encode_recon = encode_recon
        self._x = _ExchangeState()
        self._gc: Optional[GaussianConditionalTables] = None
        self._eb = None  # (cdfs, lengths, offsets, medians)
        self._gc_ext = None  # tables with the pad row (device backend)
        self._dev_tables = None
        cls = type(model)

        # Variable-rate hyper-latent (VBR + vr_entbttlnck): the z step is a
        # data-dependent scalar, downloaded once per (s, inputscale) level
        # and cached; EB tables are then built per distinct step.
        self._vr = bool(getattr(model.cfg, "vr_entbttlnck", False))
        self._zqs_cache: dict[tuple, float] = {}
        self._eb_cache: dict[float, tuple] = {}
        # Decode upload-buffer ratchets: bucket sizes never shrink, so the
        # jitted decode program converges to one shape per session.
        self._words_bucket = 0
        self._esc_bucket = 0

        self._analyze = jax.jit(make_analyze_fn(model))
        self._gain_scale = jax.jit(
            lambda p, s, isc: model.apply({"params": p}, s, isc,
                                          method=cls.gain_scale))
        self._z_step = jax.jit(
            lambda p, s, isc: model.apply({"params": p}, s, isc,
                                          method=cls.z_step))
        if backend == "device":
            self._dev_n_steps = 12
            self.parametric = False  # set by update()
            self.analytic_enc_rows = 0  # set by update() (self_check_encode)
            self._encode_pass = jax.jit(
                lambda p, y, zs, sc, zqs: model.apply(
                    {"params": p}, y, zs, sc, zqs, encode_recon,
                    method=cls.codec_encode_pass))
            # On-device rANS encode: download ∝ compressed bytes instead of
            # per-symbol arrays (MLIC_DEVICE_ENCODE=0 restores host encode).
            # Streams are format v3 (global emission order): no per-lane
            # begin table — 4 B/lane smaller files AND the per-lane
            # metadata round trips shrink to one word count per image.
            self.device_encode = os.environ.get(
                "MLIC_DEVICE_ENCODE", "1") == "1"
            # Stream format v4 (default): the hyper-latent is coded INLINE
            # as the stream's leading phases — both rANS directions run
            # fully on device and the z16 download / z-symbol upload / host
            # z coding all disappear.  MLIC_UNIFIED_Z=0 restores v3
            # (separate host-coded z strings).
            self.unified_z = self.device_encode and os.environ.get(
                "MLIC_UNIFIED_Z", "1") == "1"
            # Two-dispatch encode chain (default): stage 1 analyze+context,
            # stage 2 prep+scan+compact with the symbols as program
            # parameters.  One program shatters the prep chain's fusion
            # (see make_encode_rans); the chain stays fully async with one
            # final fence, so no extra sync points.  MLIC_SPLIT_ENCODE=0
            # restores the single-program encode.
            self.split_encode = os.environ.get(
                "MLIC_SPLIT_ENCODE", "1") == "1"
            self._encode_ctx = jax.jit(
                make_encode_ctx(model, encode_recon))
            self._z_rows_base = 0
            self._z_steps_row = 0
            self._comb_cache: dict[float, Any] = {}
            if self.n_lanes is not None:
                self._build_lane_programs()
        if backend == "fused":
            self._fused = jax.jit(
                lambda p, y, zs, sc, zqs: model.apply(
                    {"params": p}, y, zs, self._x.exchange, sc, zqs,
                    method=cls.codec_pass))
        else:
            S = model.cfg.slice_num
            self._begin = jax.jit(
                lambda p, y, zs, sc, zqs: model.apply({"params": p}, y, zs,
                                                      sc, zqs,
                                                      method=cls.codec_begin))
            self._step_a = [
                jax.jit(lambda p, y, st, sym, _i=i: model.apply(
                    {"params": p}, y, st, sym, _i,
                    method=cls.codec_step_anchor))
                for i in range(S)]
            self._step_n = [
                jax.jit(lambda p, y, st, sym, _i=i: model.apply(
                    {"params": p}, y, st, sym, _i,
                    method=cls.codec_step_nonanchor))
                for i in range(S)]
            self._finish = jax.jit(
                lambda p, st: model.apply({"params": p}, st,
                                          method=cls.codec_finish))

    # ------------------------------------------------------------------
    def _build_lane_programs(self):
        """Lane-count-specialized jits (device backend).  Deferred for
        ``n_lanes="auto"`` codecs until the count resolves — see
        ``_resolve_lanes``."""
        from mlic_tpu.entropy.device_rans import encode_interleaved_device
        model, cls, n_lanes = self.model, type(self.model), self.n_lanes
        an_rows = getattr(self, "analytic_enc_rows", 0)
        self._device_pass = jax.jit(
            lambda p, zs, w, lb, tables, sc, ns, zqs, ev, eb: model.apply(
                {"params": p}, zs, w, lb, tables, sc, n_lanes, ns, zqs,
                ev, eb, method=cls.codec_device_pass),
            static_argnums=(6,))
        n_ph = 2 * model.cfg.slice_num
        self._rans_encode = jax.jit(
            lambda sym, idx, tables: encode_interleaved_device(
                sym, idx, tables, n_lanes, n_ph, fmt="global",
                analytic_rows=an_rows))
        # ONE-dispatch encode: analyze + context pass + device rANS in
        # a single program.  On the shared axon runtime each dispatched
        # program pays queueing/time-slice overhead that can dwarf its
        # device time (measured: the 20-phase encode pass runs 21
        # ms/batch inside one program vs 200+ ms/img dispatched in
        # pieces in a contended window) — so the encode side submits
        # exactly one program.
        self._encode_full = jax.jit(
            make_encode_full(model, n_lanes, self.encode_recon,
                             analytic_rows=an_rows))

    def _resolve_lanes(self, lanes: int):
        """Fix an ``n_lanes="auto"`` codec to a concrete lane count and
        build the deferred lane-specialized programs.  Resolution happens
        ONCE per codec (the compiled executables are lane-specialized);
        construct one codec per lane width to mix widths in a session.
        ``_check_auto_width`` warns when a later image would have wanted a
        much wider codec (e.g. a session that warmed up on a small tile)."""
        self._auto_resolved = True
        self.n_lanes = int(lanes)
        if self.backend == "device":
            self._build_lane_programs()
            if self.unified_z and self._eb is not None:
                self._build_unified()

    # ------------------------------------------------------------------
    def update(self, scale_table: np.ndarray | None = None, force: bool = True):
        """Rebuild integer CDF tables (reference ``mlicpp.py:470-475``)."""
        if self._gc is not None and not force:
            return False
        self._gc = GaussianConditionalTables.create(
            scale_table if scale_table is not None else get_scale_table())
        self._eb = entropy_bottleneck_tables(
            self.params["entropy_bottleneck"], self.model.cfg.N)
        self._eb_cache = {}
        self._zqs_cache = {}
        self._x.gc_cdfs = self._gc.quantized_cdf
        self._x.gc_lengths = self._gc.cdf_length
        self._x.gc_offsets = self._gc.offset
        if self.backend == "device":
            self._update_device_tables(
                scale_table if scale_table is not None else get_scale_table())
            if self.unified_z:
                self._build_unified()
        return True

    # ---------------- stream format v4 (unified y+z) -------------------
    def _combined_tables(self, eb_tabs):
        """Extend the device table dict with the factorized-prior rows so
        ONE stream carries both latents: combined ``cdf_rows`` =
        [gaussian rows..., pad row, EB rows...]; ``offsets``/``max_value``
        concatenated to match.  The Gaussian decode paths index only rows
        < z_rows_base, so extending the arrays is transparent to them; the
        z section decodes by integer-row bisection (exact by construction —
        encoder and decoder read the same table entries)."""
        gauss_rows, g_len, g_off = self._gc_ext
        eb_cdfs, eb_len, eb_off, _ = eb_tabs
        gauss_rows = np.asarray(gauss_rows)
        n_g = gauss_rows.shape[0]
        width = max(gauss_rows.shape[1], eb_cdfs.shape[1])
        width = max(-(-width // 64) * 64, getattr(self, "_comb_width", 0))
        self._comb_width = width
        rows = np.zeros((n_g + eb_cdfs.shape[0], width), np.int32)
        rows[:n_g, :gauss_rows.shape[1]] = gauss_rows
        rows[n_g:, :eb_cdfs.shape[1]] = np.asarray(eb_cdfs, np.int32)
        d = dict(self._dev_tables)
        d["cdf_rows"] = jnp.asarray(rows)
        d["offsets"] = jnp.asarray(np.concatenate(
            [np.asarray(g_off, np.int32), np.asarray(eb_off, np.int32)]))
        d["max_value"] = jnp.asarray(np.concatenate(
            [np.asarray(g_len, np.int32), np.asarray(eb_len, np.int32)]) - 2)
        return d, n_g, int(np.ceil(np.log2(width)))

    def _build_unified(self):
        """(Re)build the v4 combined tables + jitted programs after
        ``update``.  ``z_rows_base`` is static in the compiled programs but
        fixed per codec (scale-table size), so the jits are created once."""
        self._comb_cache = {}
        comb, n_g, steps = self._combined_tables(self._eb)
        self._comb_cache[1.0] = comb
        an_rows = getattr(self, "analytic_enc_rows", 0)
        rebuild = (self._z_rows_base != n_g
                   or getattr(self, "_v4_analytic_rows", -1) != an_rows
                   or not hasattr(self, "_encode_full_v4"))
        self._z_rows_base = n_g
        self._z_steps_row = steps
        if self.n_lanes is None:
            return  # "auto": the v4 jits build at lane resolution
        if rebuild:
            self._v4_analytic_rows = an_rows
            model, cls = self.model, type(self.model)
            self._encode_full_v4 = jax.jit(make_encode_full(
                model, self.n_lanes, self.encode_recon, unified_z=True,
                z_rows_base=n_g, analytic_rows=an_rows))
            self._encode_rans2_v4 = jax.jit(make_encode_rans(
                model, self.n_lanes, unified_z=True, z_rows_base=n_g,
                analytic_rows=an_rows))
            base = n_g
            self._device_pass_v4 = jax.jit(
                lambda p, w, ib, tables, sc, zqs, ev, eb, zh, zw, ns, zsr: (
                    model.apply(
                        {"params": p}, zh, zw, w, ib, tables, sc,
                        self.n_lanes, ns, zsr, base, zqs, ev, eb,
                        method=cls.codec_device_pass_v4)),
                static_argnums=(8, 9, 10, 11))

    def _dev_tables_for(self, z_qs: float):
        """Per-quantization-step device tables (v4: the EB rows depend on
        ``z_qs`` for variable-rate bottlenecks; cached per level)."""
        if not self.unified_z:
            return self._dev_tables
        tabs = self._comb_cache.get(z_qs)
        if tabs is None:
            width0 = self._comb_width
            tabs, _, steps = self._combined_tables(self._eb_for(z_qs))
            if self._comb_width != width0 or steps != self._z_steps_row:
                # wider EB rows at this level: rebuild every cached level
                # at the new ratcheted width so one program shape serves all
                self._z_steps_row = max(self._z_steps_row, steps)
                for q in list(self._comb_cache):
                    self._comb_cache[q] = self._combined_tables(
                        self._eb_for(q))[0]
                tabs = self._combined_tables(self._eb_for(z_qs))[0]
            self._comb_cache[z_qs] = tabs
        return tabs

    def _update_device_tables(self, scale_table):
        """Decode tables for the device backend.

        Primary path (round 2): the gather-free PARAMETRIC tables — the
        integer CDFs are generated on device from the analytic quantized-
        Gaussian formula and the decode scan re-evaluates the same formula
        (``entropy/parametric.py``).  Enabled only if the generated table is
        rANS-valid and the decode-shaped self-check reproduces it bit-
        exactly; otherwise fall back to the O(1) LUT tables of round 1.
        The pad row (slot 0 carries ~all mass; pad symbols cost ~2e-5 bits
        each) is row ``n_rows-1`` in both layouts.
        """
        import hashlib

        from mlic_tpu.entropy import parametric
        from mlic_tpu.entropy.device_rans import (
            device_tables,
            parametric_device_tables,
        )

        params, lengths, offsets = parametric.gaussian_row_params(scale_table)
        # Disk cache: the parametric tables are a pure function of the
        # scale table, but generating + validating + self-checking them
        # costs device round trips that take minutes in degraded tunnel
        # windows (measured update() 56 s -> 371 s same code).  A cache hit
        # skips all device work (the entry was validated when written).
        cache_dir = os.environ.get(
            "MLIC_TABLE_CACHE",
            os.path.expanduser("~/.cache/mlic_tpu_tables"))
        # b"r4-selrows": salt bumped when the self-check program SHAPES
        # change (the verdicts certify those shapes) — forces one fresh
        # validation pass per table under the current access pattern.
        key = hashlib.sha256(
            np.ascontiguousarray(scale_table).tobytes()
            + params.tobytes() + lengths.tobytes()
            + b"r4-selrows").hexdigest()[:24]
        cache_file = os.path.join(cache_dir, f"gauss_{key}.npz") if cache_dir else ""
        table = None
        enc_ok = None
        if cache_file and os.path.exists(cache_file):
            cached = np.load(cache_file)
            table = cached["table"]
            if "enc_ok" in cached.files:
                enc_ok = bool(cached["enc_ok"])

        def _write_cache():
            if cache_file:
                os.makedirs(cache_dir, exist_ok=True)
                tmp = cache_file + f".tmp{os.getpid()}.npz"
                np.savez_compressed(tmp, table=np.asarray(table),
                                    enc_ok=np.asarray(bool(enc_ok)))
                os.replace(tmp, cache_file)

        if table is None:
            table = parametric.generate_tables(params, lengths)
            if (parametric.validate_tables(table, lengths)
                    and parametric.self_check(params, table, lengths)):
                enc_ok = parametric.self_check_encode(params, table, lengths)
                _write_cache()
            else:
                table = None
        elif enc_ok is None:
            # cache written by a pre-r4 build: add the encode verdict
            enc_ok = parametric.self_check_encode(params, table, lengths)
            _write_cache()
        if table is not None:
            table = np.asarray(table)
            self._gc_ext = (table, lengths, offsets)
            self._dev_tables = parametric_device_tables(params, lengths,
                                                        offsets, table)
            self._dev_n_steps = parametric.bisect_steps(lengths)
            self.parametric = True
            # Gather-free ANALYTIC encode prep (r4): enabled only when the
            # encode-shaped program reproduces the integer table bit-exactly
            # (device_rans.analytic_start_freq; ~70 ms/batch-8 of gathers
            # otherwise).  Rebuild the encode jits so the static flag lands.
            self.analytic_enc_rows = params.shape[0] if enc_ok else 0
            if self.n_lanes is not None:
                self._build_lane_programs()
            return
        self.analytic_enc_rows = 0
        # Fallback: host-built largest-remainder tables + cf LUTs.
        self.parametric = False
        n, t = self._gc.quantized_cdf.shape
        cdfs = np.zeros((n + 1, t), np.int32)
        cdfs[:n] = self._gc.quantized_cdf
        cdfs[n, :3] = [0, (1 << 16) - 1, 1 << 16]
        lengths = np.concatenate([self._gc.cdf_length, [3]]).astype(np.int32)
        offsets = np.concatenate([self._gc.offset, [0]]).astype(np.int32)
        self._gc_ext = (cdfs, lengths, offsets)
        self._dev_tables = device_tables(cdfs, lengths, offsets)

    def _require_tables(self):
        if self._gc is None or self._eb is None:
            self.update()

    def _check_auto_width(self, h: int, w: int):
        """Auto lane resolution is sticky (the compiled programs are
        lane-specialized): a codec that resolved on a small tile keeps its
        narrow width for the whole session.  Decode stays bit-exact at any
        width, but a much larger image then codes with needlessly short
        lanes (longer decode scans).  Warn once so the caller knows to
        build a per-size codec if that matters."""
        if not getattr(self, "_auto_resolved", False) \
                or getattr(self, "_warned_auto_width", False):
            return
        want = auto_lanes(self.model.cfg, h, w)
        if want >= 4 * self.n_lanes:
            import warnings
            warnings.warn(
                f"Codec resolved n_lanes={self.n_lanes} from its first "
                f"image, but a {h}x{w} image would pick {want}; lane count "
                "is fixed per codec — construct a separate Codec for large "
                "images to keep decode scans short.", stacklevel=3)
            self._warned_auto_width = True

    def _scale_for(self, s: int, inputscale: float):
        """Coding-time gain.  Fixed-rate models skip the device gather
        entirely (a dispatched one-op program per compress/decompress call
        costs a tunnel round trip for a constant 1.0)."""
        if not getattr(self.model.cfg, "vbr", False):
            return 1.0
        return self._gain_scale(self.params, jnp.asarray(s, jnp.int32),
                                jnp.asarray(inputscale, jnp.float32))

    def _z_qs_for(self, s: int, inputscale: float) -> float:
        """Host value of the z quantization step for a rate level (1.0 for
        fixed-rate bottlenecks); one tiny download per distinct level."""
        if not self._vr:
            return 1.0
        key = (int(s), float(inputscale))
        if key not in self._zqs_cache:
            self._zqs_cache[key] = float(np.asarray(self._z_step(
                self.params, jnp.asarray(s, jnp.int32),
                jnp.asarray(inputscale, jnp.float32))))
        return self._zqs_cache[key]

    def _eb_for(self, z_qs: float):
        """EB tables for a given quantization step (reference
        ``EntropyBottleneckVbr.update_variable``, ``mlicpp_vbr.py:1168-1183``)."""
        if z_qs == 1.0 and self._eb is not None:
            return self._eb
        tabs = self._eb_cache.get(z_qs)
        if tabs is None:
            tabs = entropy_bottleneck_tables(
                self.params["entropy_bottleneck"], self.model.cfg.N, qs=z_qs)
            self._eb_cache[z_qs] = tabs
        return tabs

    # ------------------------------------------------------------------
    def _flush_interleaved(self, batch: int) -> list[bytes]:
        """Pack buffered per-phase symbols into per-image interleaved
        rans16 streams — format v3 (global emission order), matching the
        device encoder byte-for-byte (each phase padded to a multiple of
        n_lanes with pad-row symbols)."""
        from mlic_tpu.entropy.rans.coder import encode_global
        cdfs, lengths, offsets = self._gc_ext
        pad_row = len(lengths) - 1
        streams = []
        for b in range(batch):
            syms, idxs = [], []
            for cand, idx in self._x.encoder_chunks:
                s = cand[b].ravel().astype(np.int32)
                i = idx[b].ravel().astype(np.int32)
                pad = (-len(s)) % self.n_lanes
                if pad:
                    s = np.concatenate([s, np.zeros(pad, np.int32)])
                    i = np.concatenate([i, np.full(pad, pad_row, np.int32)])
                syms.append(s)
                idxs.append(i)
            streams.append(encode_global(
                np.concatenate(syms), np.concatenate(idxs), self.n_lanes,
                cdfs, lengths, offsets))
        return streams

    def _run_codec(self, y, z_symbols, scale, z_qs=1.0):
        """Run the shared codec program under the current exchange mode."""
        if self.backend == "fused":
            return self._fused(self.params, y, z_symbols, scale, z_qs)
        state, indexes, cand = self._begin(self.params, y, z_symbols, scale,
                                           z_qs)
        for idx in range(self.model.cfg.slice_num):
            sym = self._x.exchange(f"a{idx}", indexes, cand)
            state, indexes, cand = self._step_a[idx](
                self.params, y, state, jnp.asarray(sym, jnp.int32))
            sym = self._x.exchange(f"n{idx}", indexes, cand)
            state, indexes, cand = self._step_n[idx](
                self.params, y, state, jnp.asarray(sym, jnp.int32))
        return self._finish(self.params, state)

    def _download_streams(self, rans: dict, batch: int,
                          extra_fetch: tuple = ()) -> list[bytes] | tuple:
        """Fetch the device-encoded streams: per-image word counts (B
        int32s — format v3 has no per-lane metadata) plus bucket-rounded
        slices of the word/escape buffers (∝ compressed bytes), then
        assemble the per-image format-v3 streams on the host —
        byte-identical to ``coder.encode_global``'s output.

        Steady state costs ONE synchronous device->host fetch: the word
        buffer is speculatively sliced at the ratcheted bucket from the
        previous batch and fetched TOGETHER with the image metadata (and any
        ``extra_fetch`` arrays the caller wants in the same round trip);
        only when a batch's stream outgrows the ratchet (which then grows,
        so at most a handful of times per session) is a tail fetch needed.
        Each synchronous fetch on the shared axon runtime costs a tunnel
        round trip PLUS a rescheduling stall in contended windows — the
        fetch count, not the byte count, dominates."""
        from mlic_tpu.entropy.rans.coder import _V3_FLAG, _V4_FLAG
        nl = self.n_lanes
        fmt_flags = _V3_FLAG | (_V4_FLAG if self.unified_z else 0)
        spec_bucket = getattr(self, "_enc_words_bucket", 0)
        fetch = [rans["img_n"], rans["ecount"],
                 rans["buf"][:spec_bucket]] + list(extra_fetch)
        img_n, ecount, buf0, *extra = jax.device_get(fetch)
        img_begin = np.concatenate([[0], np.cumsum(img_n)[:-1]]).astype(np.int64)
        total = int(img_begin[-1] + img_n[-1])
        etotal = int(ecount.sum())
        self._enc_words_bucket = min(
            max(spec_bucket, _dl_bucket(total)), rans["buf"].shape[0])
        if total <= spec_bucket:
            buf = np.asarray(buf0)
        else:  # ratchet grew: fetch the missing tail once
            buf = np.concatenate([
                np.asarray(buf0),
                np.asarray(rans["buf"][spec_bucket:self._enc_words_bucket])])
        if etotal:
            self._enc_esc_bucket = min(
                max(getattr(self, "_enc_esc_bucket", 0),
                    _dl_bucket(etotal, minimum=1024)),
                rans["ebuf"].shape[0])
            ebuf = np.asarray(rans["ebuf"][:self._enc_esc_bucket])
        else:
            ebuf = np.zeros(0, np.int32)
        eb = np.concatenate([[0], np.cumsum(ecount)]).astype(np.int64)
        streams = []
        for b in range(batch):
            w0, w1 = int(img_begin[b]), int(img_begin[b] + img_n[b])
            header = np.asarray([np.uint32(nl) | fmt_flags, w1 - w0,
                                 int(ecount[b])], np.uint32).tobytes()
            body = buf[w0:w1].tobytes()
            if len(body) % 4:
                body += b"\x00\x00"
            streams.append(header + body
                           + ebuf[eb[b]:eb[b + 1]].astype(np.int32).tobytes())
        if extra_fetch:
            return streams, extra
        return streams

    def _decode_z_host(self, z_strings, z_qs, batch: int, zh: int, zw: int,
                       n_ch: int) -> np.ndarray:
        """Host factorized-prior decode of per-image z strings (formats
        <= v3; format v4 decodes z on device inside the same program)."""
        eb_cdfs, eb_lengths, eb_offsets, _ = self._eb_for(z_qs)
        z_idx = np.broadcast_to(np.arange(n_ch, dtype=np.int32),
                                (zh, zw, n_ch))
        return np.stack([
            decode_with_indexes(z_strings[b], z_idx.ravel(), eb_cdfs,
                                eb_lengths, eb_offsets).reshape(zh, zw, n_ch)
            for b in range(batch)])

    def _encode_z(self, z_np: np.ndarray, z_qs, batch: int) -> list[bytes]:
        """Factorized-prior coding of z: per-channel CDF rows, per image."""
        eb_cdfs, eb_lengths, eb_offsets, _ = self._eb_for(z_qs)
        z_idx = np.broadcast_to(np.arange(z_np.shape[-1], dtype=np.int32),
                                z_np.shape[1:])
        return [encode_with_indexes(z_np[b].ravel(), z_idx.ravel(),
                                    eb_cdfs, eb_lengths, eb_offsets)
                for b in range(batch)]

    # ------------------------------------------------------------------
    def compress_begin(self, x, s: int = 0, inputscale: float = 0.0) -> dict:
        """Dispatch half of a device-backend compress: uploads the batch
        and queues the analyze / encode / device-rANS programs WITHOUT any
        device->host fetch.  Returns a handle for ``compress_end``.

        Split so a serving loop can overlap the host-side half (stream
        downloads, z coding) of batch i with the device compute of batch
        i+1 (``bench.py`` pipeline mode; the device executes programs in
        dispatch order, so correctness is unaffected)."""
        assert self.backend == "device", "begin/end split is device-backend only"
        self._require_tables()
        if self.n_lanes is None:
            self._resolve_lanes(auto_lanes(self.model.cfg,
                                           x.shape[1], x.shape[2]))
        else:
            self._check_auto_width(x.shape[1], x.shape[2])
        t0 = time.perf_counter()
        scale = self._scale_for(s, inputscale)
        z_qs = self._z_qs_for(s, inputscale)
        x = jnp.asarray(x)
        if x.dtype != jnp.uint8:
            x = x.astype(jnp.float32)
        if self.device_encode:
            if self.split_encode:
                # Two-dispatch chain: context program, then the rANS
                # program over its device-resident outputs.  Both async —
                # the fence stays in compress_end (see make_encode_rans
                # for why the fusion boundary matters).
                h = dict(self._encode_ctx(self.params, x, scale, z_qs))
                if self.unified_z:
                    h["rans"] = self._encode_rans2_v4(
                        h.pop("sym32"), h["idx"], h.pop("z_flat"),
                        self._dev_tables_for(z_qs))
                else:
                    h.pop("sym32")
                    h.pop("z_flat")
                    h["rans"] = self._rans_encode(h["sym16"], h["idx"],
                                                  self._dev_tables)
            # Single-dispatch path: one program for the whole encode side.
            elif self.unified_z:
                h = dict(self._encode_full_v4(self.params, x, scale, z_qs,
                                              self._dev_tables_for(z_qs)))
            else:
                h = dict(self._encode_full(self.params, x, scale, z_qs,
                                           self._dev_tables))
        else:
            y, z_symbols, z16 = self._analyze(self.params, x, z_qs)
            enc_out = self._encode_pass(self.params, y, z_symbols, scale, z_qs)
            x_hat, y_hat, sym16, sym8, idx, flags, _sym32 = enc_out
            h = {"y": y, "z_symbols": z_symbols, "z16": z16, "x_hat": x_hat,
                 "y_hat": y_hat, "sym16": sym16, "sym8": sym8, "idx": idx,
                 "flags": flags, "rans": None}
        h.update(t0=t0, batch=x.shape[0], scale=scale, z_qs=z_qs)
        return h

    def compress_end(self, h: dict) -> dict:
        """Host half of a device-backend compress: fetch flags/z + streams
        in ONE combined device->host round trip (each synchronous fetch
        costs a tunnel RTT plus a rescheduling stall in contended windows),
        encode z on the host, assemble the y streams."""
        batch = h["batch"]
        z_qs = h["z_qs"]
        x_hat, y_hat = h["x_hat"], h["y_hat"]
        if h["rans"] is not None and self.unified_z:
            # Format v4: the stream already carries z — ONE fetch, zero
            # host coding.  The z string slot stays (empty) so containers
            # keep their two-streams-per-image shape.
            y_strings = self._download_streams(h["rans"], batch)
            zsh = h["z_symbols"].shape
            return {
                "strings": [y_strings, [b""] * batch],
                "shape": (int(zsh[1]), int(zsh[2])),
                "cost_time": time.perf_counter() - h["t0"],
                "x_hat": x_hat,
                "y_hat": y_hat,
            }
        if h["rans"] is not None:
            y_strings, (flags_np, z_np) = self._download_streams(
                h["rans"], batch, extra_fetch=(h["flags"], h["z16"]))
            flags_np = np.asarray(flags_np)  # [sym>i16, sym>i8, z>i16]
            if not flags_np[0]:
                if flags_np[2]:
                    z_np = np.asarray(h["z_symbols"])
                z_np = np.asarray(z_np).astype(np.int32)
                z_strings = self._encode_z(z_np, z_qs, batch)
                return {
                    "strings": [y_strings, z_strings],
                    "shape": (int(z_np.shape[1]), int(z_np.shape[2])),
                    "cost_time": time.perf_counter() - h["t0"],
                    "x_hat": x_hat,
                    "y_hat": y_hat,
                }
        else:
            flags_np, z_np = jax.device_get((h["flags"], h["z16"]))
            flags_np = np.asarray(flags_np)
        if flags_np[2]:
            z_np = np.asarray(h["z_symbols"])
        z_np = np.asarray(z_np).astype(np.int32)
        z_strings = self._encode_z(z_np, z_qs, batch)
        if not flags_np[0]:
            # Narrowest safe symbol download (axon: ~11 MB/s down).
            sym = np.asarray(h["sym16"] if flags_np[1]
                             else h["sym8"]).astype(np.int32)
            idx = np.asarray(h["idx"])
            n_phases = 2 * self.model.cfg.slice_num
            n_per = sym.shape[1] // n_phases
            self._x.encoder_chunks = [
                (sym[:, k * n_per:(k + 1) * n_per],
                 idx[:, k * n_per:(k + 1) * n_per])
                for k in range(n_phases)]
        else:
            # int16 overflow (untrained/degenerate latents): redo the
            # symbol collection through the int32 steps path.
            self._x.mode = "encode"
            self._x.encoder_chunks = []
            x_hat, y_hat = self._run_codec(h["y"], h["z_symbols"], h["scale"],
                                           z_qs)
            jax.block_until_ready(x_hat)
            self._x.mode = "idle"
        y_strings = self._flush_interleaved(batch)
        self._x.encoder_chunks = []
        return {
            "strings": [y_strings, z_strings],
            "shape": (int(z_np.shape[1]), int(z_np.shape[2])),
            "cost_time": time.perf_counter() - h["t0"],
            "x_hat": x_hat,
            "y_hat": y_hat,
        }

    def compress(self, x, s: int = 0, inputscale: float = 0.0) -> dict:
        """x: [B,H,W,3] float in [0,1], H and W multiples of 64.

        Batched: every image in the batch is coded in the same device
        passes (the per-phase host crossings amortize over B), each into
        its OWN bitstream — ``strings = [y_strings, z_strings]`` with one
        string per image, decodable individually.

        For VBR models, ``s`` selects the gain level and ``inputscale`` (>0)
        overrides it with a continuous rate (reference
        ``mlicpp_vbr.py:535``); both are traced scalars — no recompile.
        """
        if self.backend == "device":
            return self.compress_end(self.compress_begin(x, s, inputscale))

        self._require_tables()
        if self.n_lanes is None:
            self._resolve_lanes(auto_lanes(self.model.cfg,
                                           x.shape[1], x.shape[2]))
        else:
            self._check_auto_width(x.shape[1], x.shape[2])
        batch = x.shape[0]
        t0 = time.perf_counter()
        scale = self._scale_for(s, inputscale)
        z_qs = self._z_qs_for(s, inputscale)
        x = jnp.asarray(x)
        if x.dtype != jnp.uint8:
            x = x.astype(jnp.float32)
        y, z_symbols, z16 = self._analyze(self.params, x, z_qs)

        # y: shared codec program in encode mode.
        z_np = np.asarray(z_symbols)
        z_strings = self._encode_z(z_np, z_qs, batch)
        self._x.mode = "encode"
        self._x.encoder_chunks = []
        x_hat, y_hat = self._run_codec(y, z_symbols, scale, z_qs)
        jax.block_until_ready(x_hat)
        self._x.mode = "idle"
        y_strings = []
        for b in range(batch):
            symbols = np.concatenate([c[0][b].ravel()
                                      for c in self._x.encoder_chunks])
            indexes = np.concatenate([c[1][b].ravel()
                                      for c in self._x.encoder_chunks])
            y_strings.append(encode_with_indexes(
                symbols, indexes, self._gc.quantized_cdf,
                self._gc.cdf_length, self._gc.offset))
        self._x.encoder_chunks = []
        cost_time = time.perf_counter() - t0
        return {
            "strings": [y_strings, z_strings],
            "shape": (int(z_np.shape[1]), int(z_np.shape[2])),
            "cost_time": cost_time,
            "x_hat": x_hat,   # encode-side reconstruction (free byproduct)
            "y_hat": y_hat,
        }

    # ------------------------------------------------------------------
    def decompress(self, strings, shape, s: int = 0, inputscale: float = 0.0,
                   wait: bool = True) -> dict:
        """strings: [y_strings, z_strings] (one per image); shape: (h/4, w/4).

        ``wait=False`` skips the final block_until_ready so callers can
        pipeline: the device programs are dispatched and the caller overlaps
        host work (e.g. the next image's stream parsing) with device
        execution, blocking on ``x_hat`` itself when needed.  ``cost_time``
        then measures dispatch, not completion."""
        self._require_tables()
        if self.n_lanes is None and self.backend == "device" and strings[0]:
            # Decode-only DEVICE codec: follow the stream's own lane count
            # (the device formats v2/v3/v4 all lead with it) — no width
            # coordination needed between encoder and decoder processes.
            # The steps backend's y streams are raw ``encode_with_indexes``
            # output with NO lane header, and its decode path never needs a
            # lane count — it resolves lazily from the image size on the
            # first compress instead.
            from mlic_tpu.entropy.rans.coder import stream_lanes
            self._resolve_lanes(stream_lanes(strings[0][0]))
        t0 = time.perf_counter()
        scale = self._scale_for(s, inputscale)
        z_qs = self._z_qs_for(s, inputscale)
        y_strings = strings[0]
        z_strings = strings[1]
        batch = len(y_strings)
        zh, zw = shape
        n_ch = self.model.cfg.N

        if self.backend == "device":
            from mlic_tpu.entropy.rans.coder import (
                parse_global,
                stream_is_unified,
            )
            unified = stream_is_unified(y_strings[0])
            if unified and not self.unified_z:
                raise ValueError(
                    "format-v4 stream (inline z) but this codec was built "
                    "with MLIC_UNIFIED_Z=0")
            words_list, img_begins, escs, esc_begins = [], [], [], []
            offset = 0
            esc_off = 0
            for b in range(batch):
                s_lanes, wds, esc = parse_global(y_strings[b])
                assert s_lanes == self.n_lanes, (
                    f"stream has {s_lanes} lanes, codec built for "
                    f"{self.n_lanes}")
                words_list.append(wds)
                img_begins.append(offset)
                offset += len(wds)
                escs.append(esc)
                esc_begins.append(esc_off)
                esc_off += len(esc)
            words = np.concatenate(words_list)
            self._words_bucket = max(self._words_bucket, _bucket(len(words)))
            padded = np.zeros(self._words_bucket, np.uint16)
            padded[:len(words)] = words
            img_begin = np.asarray(img_begins, np.int32)
            self._esc_bucket = max(self._esc_bucket,
                                   _bucket(max(esc_off, 1), minimum=1024))
            esc_values = np.zeros(self._esc_bucket, np.int32)
            if esc_off:
                esc_values[:esc_off] = np.concatenate(escs)
            if unified:
                # Format v4: z decodes on device from the same stream —
                # no host entropy coding, no z-symbol upload.
                x_hat, y_hat = self._device_pass_v4(
                    self.params, jnp.asarray(padded), jnp.asarray(img_begin),
                    self._dev_tables_for(z_qs), scale, z_qs,
                    jnp.asarray(esc_values),
                    jnp.asarray(np.asarray(esc_begins, np.int32)),
                    zh, zw, self._dev_n_steps, self._z_steps_row)
            else:
                z_symbols = self._decode_z_host(z_strings, z_qs, batch,
                                                zh, zw, n_ch)
                # int16 halves the z upload (~32 MB/s axon tunnel); int32
                # only for degenerate latents (separate program, compiled
                # if ever hit).  The steps backend below keeps int32 so
                # encode and decode share compiled executables.
                zdt = (np.int16
                       if np.abs(z_symbols).max(initial=0) <= 32767
                       else np.int32)
                x_hat, y_hat = self._device_pass(
                    self.params, jnp.asarray(z_symbols.astype(zdt)),
                    jnp.asarray(padded), jnp.asarray(img_begin),
                    self._dev_tables, scale, self._dev_n_steps, z_qs,
                    jnp.asarray(esc_values),
                    jnp.asarray(np.asarray(esc_begins, np.int32)))
            if wait:
                jax.block_until_ready(x_hat)
            return {"x_hat": x_hat, "y_hat": y_hat,
                    "cost_time": time.perf_counter() - t0}

        z_symbols = self._decode_z_host(z_strings, z_qs, batch, zh, zw, n_ch)

        h, w = zh * 4, zw * 4
        y_zero = jnp.zeros((batch, h, w, self.model.cfg.M), jnp.float32)
        z_symbols = jnp.asarray(z_symbols, jnp.int32)

        self._x.mode = "decode"
        self._x.decoders = []
        for b in range(batch):
            dec = RansDecoder()
            dec.set_stream(y_strings[b])
            self._x.decoders.append(dec)
        x_hat, y_hat = self._run_codec(y_zero, z_symbols, scale, z_qs)
        jax.block_until_ready(x_hat)  # steps backend is host-driven: always sync
        self._x.mode = "idle"
        for dec in self._x.decoders:
            dec.close()
        self._x.decoders = []
        cost_time = time.perf_counter() - t0
        return {"x_hat": x_hat, "y_hat": y_hat, "cost_time": cost_time}

    # ------------------------------------------------------------------
    def roundtrip_stream(self, batches, s: int = 0, inputscale: float = 0.0,
                         wait: bool = True):
        """Serving pipeline: yield ``(enc, dec)`` per input batch with a
        two-deep schedule — the device executes batch i+1's encode while
        the host downloads/assembles batch i's streams and dispatches its
        decode (device backend only; others degrade to sequential).

        With ``wait=False`` the yielded ``dec["x_hat"]`` is an
        un-materialized device array the caller fences itself."""
        if self.backend != "device":
            for x in batches:
                enc = self.compress(x, s, inputscale)
                yield enc, self.decompress(enc["strings"], enc["shape"], s,
                                           inputscale)
            return
        it = iter(batches)
        try:
            h = self.compress_begin(next(it), s, inputscale)
        except StopIteration:
            return
        pending = None  # (enc, dec) whose x_hat is still in flight
        while h is not None:
            nxt = next(it, None)
            h_next = (self.compress_begin(nxt, s, inputscale)
                      if nxt is not None else None)
            enc = self.compress_end(h)
            dec = self.decompress(enc["strings"], enc["shape"], s,
                                  inputscale, wait=False)
            if pending is not None:
                if wait:
                    jax.block_until_ready(pending[1]["x_hat"])
                yield pending
            pending = (enc, dec)
            h = h_next
        if wait:
            jax.block_until_ready(pending[1]["x_hat"])
        yield pending
