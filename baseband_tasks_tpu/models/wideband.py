"""Flagship model: wideband coherent-dedispersion + fold pipeline.

One fused, jit-compiled step covering BASELINE.json configs 4/5: a block of
channelized dual/quad-pol complex baseband → per-channel coherent
dedispersion (overlap-save chirp) → detection → phase-binned fold, sharded
over a (time, chan) TPU mesh:

- **chan axis**: frequency channels spread across chips; dedispersion and
  folding are per-channel, so this axis needs no communication.
- **time axis**: the sample axis is block-sharded; overlap-save pads move
  between neighbor chips by ``ppermute`` halo exchange over ICI
  (parallel/halo.py), and fold partial profiles reduce with ``psum``.

Everything in the step is static-shaped; XLA fuses chirp multiply and
detection into the FFTs.  Complex data crosses the host boundary as
trailing float32 pairs (the axon TPU backend transfers f32 only).

Reference parity: composes the semantics of dispersion.py Disperse (chirp),
functions.py Square, and integration.py Fold into one device program.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dm import DispersionMeasure
from ..parallel.halo import halo_exchange
from ..utils import units as u

__all__ = ["WidebandPulsarPipeline"]

# one pulse cycle in the kernels' fixed-point units — the single source
# of the encoding is ops.dedisperse_pallas (fold_phase_vector contract)
from ..ops.dedisperse_pallas import _FX_MASK, _FX_ONE  # noqa: E402


class WidebandPulsarPipeline:
    """Fused dedisperse→detect→fold step over a (time, chan) mesh.

    Parameters
    ----------
    n_chan, n_pol : int
        Channels and polarizations of the input block.
    dm : float or DispersionMeasure
        Dispersion measure to remove (pc/cm³).
    freq_center : Quantity
        Band-centre sky frequency; channels are spaced by ``chan_rate``.
    chan_rate : Quantity
        Per-channel (complex) sample rate.
    period_samples : Fraction or tuple (q, p)
        Pulsar period as the exact rational q/p in units of channel
        samples.  The sample-offset bookkeeping stays exact integer
        (mod q) forever; per block the phase is re-encoded into the
        kernels' fixed-point map (error <= 2^-32 cycle/sample within a
        block, never cumulative).  Requires p·q < 2^31 and q < 2^23.
    n_phase : int
        Phase bins per profile.
    block_samples : int
        Samples per time shard per step.
    mesh : jax.sharding.Mesh, optional
        (time, chan) mesh; default: single current device.
    """

    def __init__(self, *, n_chan=1024, n_pol=4, dm=500.0,
                 freq_center=None, chan_rate=None,
                 period_samples=(16000, 3), n_phase=64,
                 block_samples=16384, mesh=None, fft_pow2=False,
                 use_pallas=False, phase_model=None, start_time=None,
                 ingest_bits=8, detect="power", halo="ppermute"):
        if freq_center is None:
            freq_center = 1400 * u.MHz
        if chan_rate is None:
            chan_rate = 250 * u.kHz
        self.n_chan = n_chan
        self.n_pol = n_pol
        if detect not in ("power", "stokes"):
            raise ValueError(f"detect={detect!r}: 'power' or 'stokes'")
        if detect == "stokes" and n_pol != 2:
            raise ValueError("detect='stokes' needs dual polarization "
                             "(n_pol=2): lanes pair (X, Y) per channel")
        #: 'power' -> |x|^2 per (chan, pol); 'stokes' -> per channel
        #: [XX, YY, Re(X Y*), Im(X Y*)] (reference functions.py:132-143)
        self.detect = detect
        if halo not in ("ppermute", "remote"):
            raise ValueError(f"halo={halo!r}: 'ppermute' or 'remote'")
        #: 'ppermute' -> XLA collective halo exchange; 'remote' -> pallas
        #: in-kernel async remote DMA (parallel/halo_pallas.py; on the
        #: CPU interpreter multi-axis meshes transparently fall back to
        #: ppermute — the emulator cannot discharge multi-axis DMAs)
        self.halo = halo
        self.n_phase = n_phase
        self.block_samples = block_samples
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                        ("time", "chan"))
        self.mesh = mesh
        self.n_time_shards = mesh.shape["time"]
        self.n_chan_shards = mesh.shape["chan"]
        if n_chan % self.n_chan_shards:
            raise ValueError("n_chan must divide over the chan mesh axis")
        if isinstance(period_samples, Fraction):
            frac = period_samples
        else:
            q, p = period_samples
            frac = Fraction(q, p)
        self._per_q = int(frac.numerator)    # q samples per p periods
        self._per_p = int(frac.denominator)
        if self._per_p * self._per_q >= (1 << 31) or \
                self._per_q >= (1 << 23):
            raise ValueError(
                f"period_samples {self._per_q}/{self._per_p} too fine: "
                f"need p*q < 2^31 and q < 2^23 for exact bookkeeping")
        if not 0 < int(n_phase) <= (1 << 15):
            raise ValueError(f"n_phase={n_phase} must be in [1, 32768]")
        # static fixed-point phase rate for the fixed-period mode
        self._p_fx = int(round((Fraction(self._per_p, self._per_q) % 1)
                               * _FX_ONE)) & _FX_MASK
        # Optional drifting phase model (e.g. PolycoPhase): per block the
        # host refreshes a fixed-point (i0_fx, p_fx) encoding of the
        # linearized phase (models/foldmodel.py); when None the fixed
        # rational period above is used forever.
        if phase_model is not None:
            from .foldmodel import FoldModel
            if start_time is None:
                raise ValueError("phase_model requires start_time")
            self.fold_model = FoldModel(phase_model, start_time,
                                        chan_rate, n_phase)
        else:
            self.fold_model = None

        dm = dm if isinstance(dm, DispersionMeasure) else DispersionMeasure(dm)
        self.dm = dm
        rate_hz = chan_rate.to_value(u.Hz)
        self.chan_rate = chan_rate
        # channel carrier frequencies: contiguous band around the centre
        chan_idx = np.arange(n_chan) - n_chan / 2 + 0.5
        freqs_mhz = freq_center.to_value(u.MHz) \
            + chan_idx * chan_rate.to_value(u.MHz)
        self.freqs = u.Quantity(freqs_mhz, u.MHz)
        ref = freq_center
        self.reference_frequency = ref
        # per-channel pad from that channel's own smear (max over band)
        edges = np.concatenate([freqs_mhz - rate_hz / 2e6,
                                freqs_mhz + rate_hz / 2e6])
        delays = dm.time_delay(u.Quantity(edges, u.MHz), ref).to_value(u.s)
        self.pad_start = max(int(np.ceil(delays.max() * rate_hz)), 0) + 64
        self.pad_end = max(int(np.ceil(-delays.min() * rate_hz)), 0) + 64
        # keep trims and the valid block sublane-aligned (multiples of 128)
        self.pad_start = -(-self.pad_start // 128) * 128
        self.pad_end = -(-self.pad_end // 128) * 128
        if self.pad_start + self.pad_end >= block_samples:
            raise ValueError(
                f"block_samples {block_samples} too small for dispersion "
                f"pads ({self.pad_start}, {self.pad_end}); raise it or "
                f"lower the DM")
        # Grow the block so the overlap-save window fills an FFT-fast
        # length.  Measured end-to-end on v5e the 2/3/5-smooth window just
        # above the requested block beats the next power of two (8.8e8 vs
        # 5.4e8 samples/s at the DM=500 bench) even though pow2 FFTs are
        # faster per point in isolation — the smaller window wins on
        # memory traffic across the whole fused step.
        from ..fourier import next_fast_len
        self.use_pallas = bool(use_pallas)
        n_min = block_samples + self.pad_start + self.pad_end
        if fft_pow2 or self.use_pallas:
            n_fft = 1 << (n_min - 1).bit_length()
            # round pads up to multiples of N2 so the shifted window
            # reshape aligns with the (N1, N2) grid: the stream kernel
            # can then assemble windows in VMEM from block + halo edges
            # instead of materializing the padded window in HBM
            from ..ops.dedisperse_pallas import split_n
            n1, n2 = split_n(n_fft)
            self.pad_start = -(-self.pad_start // n2) * n2
            self.pad_end = -(-self.pad_end // n2) * n2
            # plane-packed ingest needs the main rows (n1 - pads/n2)
            # divisible by 32/ingest_bits (4 for 8-bit, 16 for 2-bit);
            # grow pad_end accordingly (at most (planes-1)*n2 rows)
            planes = 32 // int(ingest_bits)
            extra = (n1 - (self.pad_start + self.pad_end) // n2) % planes
            self.pad_end += extra * n2
        else:
            n_fft = next_fast_len(n_min)
        self.block_samples = n_fft - self.pad_start - self.pad_end
        self._n_fft = n_fft
        self._chirp_np = self._build_chirp()
        self._step_cache = None
        self._ingest_bits = int(ingest_bits)  # packed-ingest bit depth

    def _build_chirp(self):
        """Dedispersion chirp conj(exp(2πi φ)) over (n_fft, n_chan, 1)."""
        n = self._n_fft
        offsets_mhz = np.fft.fftfreq(n) * self.chan_rate.to_value(u.MHz)
        f_sky = self.freqs.to_value(u.MHz)[np.newaxis, :] \
            + offsets_mhz[:, np.newaxis]
        phase = self.dm.phase_delay(u.Quantity(f_sky, u.MHz),
                                    self.reference_frequency)
        cyc = np.asarray(phase.to_value(u.cycle), dtype=np.float64)
        cyc -= np.round(cyc)
        # single-plane phase (cycles, mod-1 done here in float64): the
        # pallas stage-B kernel computes cos/sin on the VPU, halving the
        # chirp's HBM read traffic
        self._theta_np = (-cyc).astype(np.float32)
        chirp = np.exp(-2j * np.pi * cyc)  # conjugate: REMOVE dispersion
        # stored as trailing float32 pairs: the TPU boundary is f32-only
        pair = np.stack([chirp.real, chirp.imag], axis=-1)
        return pair.astype(np.float32)[:, :, np.newaxis, :]

    def _chirp_storage_np(self):
        """Chirp planes in pallas four-step storage order:
        two float32 arrays (N2, N1, n_chan, n_pol)."""
        from ..ops.dedisperse_pallas import (permute_to_storage_order,
                                             split_n)
        n1, n2 = split_n(self._n_fft)
        pair = self._chirp_np[:, :, 0, :]          # (n_fft, n_chan, 2)
        stor = permute_to_storage_order(pair, n1, n2)  # (n2, n1, nc, 2)
        full = np.broadcast_to(stor[:, :, :, np.newaxis, :],
                               (n2, n1, self.n_chan, self.n_pol, 2))
        return (np.ascontiguousarray(full[..., 0]),
                np.ascontiguousarray(full[..., 1]))

    def _chirp_theta_storage_np(self):
        """Chirp phase plane (cycles) in d-major storage order:
        one float32 array (N2, N1, n_chan, n_pol)."""
        from ..ops.dedisperse_pallas import (permute_to_storage_order,
                                             split_n)
        n1, n2 = split_n(self._n_fft)
        stor = permute_to_storage_order(self._theta_np, n1, n2)
        full = np.broadcast_to(stor[:, :, :, np.newaxis],
                               (n2, n1, self.n_chan, self.n_pol))
        return np.ascontiguousarray(full)

    # -- halo backend ------------------------------------------------------
    def _halo_edges(self, x, axis=0):
        if self.halo == "remote":
            from ..parallel.halo_pallas import halo_edges_remote
            if axis != 0:
                raise NotImplementedError(
                    "halo='remote' moves axis-0 halos; reshape first")
            return halo_edges_remote(x, self.pad_start, self.pad_end,
                                     "time")
        from ..parallel.halo import halo_edges
        return halo_edges(x, self.pad_start, self.pad_end, "time",
                          axis=axis)

    def _halo_exchange(self, x):
        if self.halo == "remote":
            from ..parallel.halo_pallas import halo_exchange_remote
            return halo_exchange_remote(x, self.pad_start, self.pad_end,
                                        "time")
        return halo_exchange(x, self.pad_start, self.pad_end, "time")

    # -- the fused step --------------------------------------------------
    def _shard_fold3(self, foldv, shard, T, include_pad):
        """Per-shard (3,) int32 [i0_fx, p_fx, 0] from the block-level
        vector whose i0_fx encodes the pulse phase at the block's first
        *valid* sample (models/foldmodel.py).  Adds the shard offset
        and, for the kernel path whose local time index 0 is the start
        of the overlap-save halo, subtracts pad_start — in phase units
        via multiplication by p_fx (int32 products wrap exactly mod
        2^32, and 2^31 | 2^32, so the masked result is exact)."""
        t_off = shard * T
        if include_pad:
            t_off = t_off - self.pad_start
        base = (foldv[0] + t_off * foldv[1]) & _FX_MASK
        return jnp.stack([base, foldv[1], jnp.int32(0)])

    def _fold_bins(self, fold3, T):
        """Phase bins for T valid samples — the kernel's exact
        fixed-point map (ops/dedisperse_pallas.fold_bins_ref)."""
        t = jnp.arange(T, dtype=jnp.int32)
        num = (fold3[0] + t * fold3[1]) & _FX_MASK
        hi = num >> 16
        lo = num & 0xFFFF
        n = self.n_phase
        return ((hi * n) + ((lo * n) >> 16)) >> 15

    def _fixed_foldv(self, offset_mod):
        """(3,) int32 fixed-point fold vector for the fixed rational
        period mode, from a float32 *integer-valued* sample offset
        (phase zero at global sample 0, rate per_p/per_q cycles/sample).
        The offset is reduced mod per_q exactly in integers; only the
        final scaling to 2^-31-cycle units rounds (through float32,
        error < 2^-24 cycle — far below a phase bin)."""
        off = jnp.mod(offset_mod.astype(jnp.float32),
                      jnp.float32(self._per_q)).astype(jnp.int32)
        num = (off * self._per_p) % self._per_q   # exact: p*q < 2^31
        i0 = jnp.round(num.astype(jnp.float32)
                       * np.float32(_FX_ONE / self._per_q))
        i0 = i0.astype(jnp.int32) & _FX_MASK
        return jnp.stack([i0, jnp.int32(self._p_fx), jnp.int32(0)])

    @staticmethod
    def _foldv_from_halves(h):
        """(3,) int32 [i0_fx, p_fx, 0] from the f32-safe (4,) halves
        vector [i0_hi, i0_lo, p_hi, p_lo] (models/foldmodel.py)."""
        f = h.astype(jnp.int32)
        return jnp.stack([(f[0] << 16) | f[1], (f[2] << 16) | f[3],
                          jnp.int32(0)])

    def _foldv_device(self, fold_in):
        """Normalize a traced step input to the (3,) int32 fold vector:
        a scalar sample offset (fixed-period mode), a (4,) halves vector,
        or an already-built (3,) fixed-point vector."""
        if fold_in.ndim == 0:
            return self._fixed_foldv(fold_in)
        if fold_in.shape == (4,):
            return self._foldv_from_halves(fold_in)
        return fold_in.astype(jnp.int32)

    def _detect_xla(self, y):
        """Detect a complex (T, C, P) block: power, or full Stokes-style
        [XX, YY, Re(X Y*), Im(X Y*)] per channel (reference
        functions.py:132-143)."""
        if self.detect == "power":
            return y.real ** 2 + y.imag ** 2
        x0, x1 = y[..., 0], y[..., 1]
        cross = x0 * jnp.conj(x1)
        return jnp.stack([jnp.abs(x0) ** 2, jnp.abs(x1) ** 2,
                          cross.real, cross.imag], axis=-1)

    def _assemble_stokes(self, prof3, c_local, n_pol):
        """(n_phase, 3*C*P) kernel profile -> (n_phase, C, 4): plane 0
        holds XX/YY on the pol lanes, planes 1/2 the cross terms on the
        even (X) lanes."""
        p = prof3.reshape(self.n_phase, 3, c_local, n_pol)
        return jnp.stack([p[:, 0, :, 0], p[:, 0, :, 1],
                          p[:, 1, :, 0], p[:, 2, :, 0]], axis=-1)

    def _dedisperse_detect_xla_step(self, xf, chirp_f, T):
        """Halo-extend, FFT·chirp·IFFT, trim pads, detect (XLA path)."""
        x = jax.lax.complex(xf[..., 0], xf[..., 1])
        chirp = jax.lax.complex(chirp_f[..., 0], chirp_f[..., 1])
        w = self._halo_exchange(x)
        y = jnp.fft.ifft(jnp.fft.fft(w, axis=0) * chirp, axis=0)
        y = jax.lax.dynamic_slice_in_dim(y, self.pad_start, T, axis=0)
        return self._detect_xla(y)

    def _dedisperse_detect_pow2(self, w4, csr, csi, T):
        """Padded window (n_fft, C, P, 2) pairs -> detected power for the
        ``T`` valid samples, via the fused pallas pow2 kernels."""
        from ..ops.dedisperse_pallas import dedisperse_pow2
        n_fft, c_local, n_pol = w4.shape[:3]
        wr = w4[..., 0].reshape(n_fft, c_local * n_pol)
        wi = w4[..., 1].reshape(n_fft, c_local * n_pol)
        cs = (csr.reshape(csr.shape[0], csr.shape[1], -1),
              csi.reshape(csi.shape[0], csi.shape[1], -1))
        if self.detect == "power":
            p = dedisperse_pow2(wr, wi, *cs, power=True)
            power = p.reshape(n_fft, c_local, n_pol)
        else:
            yr, yi = dedisperse_pow2(wr, wi, *cs, power=False)
            y = jax.lax.complex(yr, yi).reshape(n_fft, c_local, n_pol)
            power = self._detect_xla(y)
        return jax.lax.dynamic_slice_in_dim(power, self.pad_start, T,
                                            axis=0)

    def _profile_epilogue(self, prof, cnt, c_local, n_pol):
        """Fused-kernel epilogue: trim the trash bin, assemble the stokes
        lane layout, and psum across time shards."""
        if self.detect == "stokes":
            prof = self._assemble_stokes(prof[:self.n_phase], c_local,
                                         n_pol)
        else:
            prof = prof[:self.n_phase].reshape(self.n_phase, c_local,
                                               n_pol)
        return (jax.lax.psum(prof, "time"),
                jax.lax.psum(cnt[:self.n_phase], "time"))

    def _local_step(self, xf, chirp_f, foldv):
        """Per-shard computation.

        xf : (T_local, C_local, P, 2) float32 — complex as trailing pairs
        chirp_f : (n_fft, C_local, 1, 2) float32 — chirp as trailing pairs
        foldv : (3,) int32 [i0_fx, p_fx, 0] — fixed-point fold vector
            at the block's first valid sample (built on device by
            :meth:`_foldv_device`; never crosses the f32-only TPU
            transfer boundary).
        """
        T = xf.shape[0]
        power = self._dedisperse_detect_xla_step(xf, chirp_f, T)
        shard = jax.lax.axis_index("time")
        fold3 = self._shard_fold3(foldv, shard, T, include_pad=False)
        bins = self._fold_bins(fold3, T)
        from ..ops import fold_accumulate
        prof, cnt = fold_accumulate(power, bins, self.n_phase)
        prof = jax.lax.psum(prof, "time")
        cnt = jax.lax.psum(cnt, "time")
        return prof, cnt

    def _local_step_pallas(self, xf, csr, csi, foldv):
        """Per-shard computation via the fused pallas dedisperse kernels.

        csr, csi : (N2, N1, C_local, P) float32 chirp storage planes.
        """
        T = xf.shape[0]
        # halo-extend the f32 pairs directly; complex never materializes
        w4 = self._halo_exchange(xf)
        power = self._dedisperse_detect_pow2(w4, csr, csi, T)
        shard = jax.lax.axis_index("time")
        fold3 = self._shard_fold3(foldv, shard, T, include_pad=False)
        bins = self._fold_bins(fold3, T)
        from ..ops import fold_accumulate
        prof, cnt = fold_accumulate(power, bins, self.n_phase)
        prof = jax.lax.psum(prof, "time")
        cnt = jax.lax.psum(cnt, "time")
        return prof, cnt

    def _local_step_pallas_planes(self, x2, csr, csi, off, foldv):
        """Planes-first fused step for the on-device run loop.

        ``x2`` : (2, T_local, C_local, P) float32 — complex as *leading*
        planes; ``csr``/``csi`` the (N2, N1, C_local, P) chirp cos/sin
        storage planes (measured 18% faster end-to-end than the
        single-phase-plane variant with in-kernel cos/sin: VPU
        transcendentals over full tiles cost more than the extra HBM
        read).  Compared to :meth:`_local_step_pallas` this removes four
        full passes over HBM: the stage-A kernel assembles windows in
        VMEM from the raw block + halo edge buffers (no padded-window
        concat), reads the planes array directly (no re/im split),
        applies the per-iteration scale ``1 + 1e-6 off`` from SMEM, and
        the halo rows fold into a trash phase bin instead of being
        sliced away first.
        """
        from ..ops.dedisperse_pallas import dedisperse_fold_stream
        T, c_local, n_pol = x2.shape[1:4]
        L = c_local * n_pol
        front, end = self._halo_edges(x2, axis=1)
        scale = (1.0 + 1e-6 * off).reshape(1)
        shard = jax.lax.axis_index("time")
        fold3 = self._shard_fold3(foldv, shard, T, include_pad=True)
        prof, cnt = dedisperse_fold_stream(
            x2.reshape(2, T, L),
            front.reshape(2, self.pad_start, L),
            end.reshape(2, self.pad_end, L),
            csr.reshape(csr.shape[0], csr.shape[1], -1),
            csi.reshape(csi.shape[0], csi.shape[1], -1),
            fold3, scale, stokes=self.detect == "stokes",
            n_phase=self.n_phase, pad_start=self.pad_start, n_valid=T)
        return self._profile_epilogue(prof, cnt, c_local, n_pol)

    def _local_step_pallas_split_packed(self, bits, cr, ci, csr, csi, off,
                                        foldv):
        """Packed 1/2/4/8-bit ingest step with the decode FUSED into K1.

        ``cr``/``ci`` : (T*bits/32, C_local, P) float32 *plane-packed*
        carriers (ops/unpack_device.pack_time_planes): field j of each
        word is the sample j*T/planes later, one encoded field per
        real/imag component (bit depth = ``run_fn``'s ``ingest_bits``).  Only the halo-edge samples are decoded
        here (to build the exchange buffers); the bulk block is decoded
        inside the stage-A kernel in the same pass as the FFT — the raw
        bytes cross HBM once, at 1/4 the read traffic of float planes.
        The 1/64 scale (keeping decoded values unit-ish) is folded into
        the kernel's per-iteration scale.
        """
        from ..ops.dedisperse_pallas import dedisperse_fold_split_packed
        from ..ops.unpack_device import plane_edges_device
        per = 32 // bits
        tq, c_local, n_pol = cr.shape
        T = tq * per
        L = c_local * n_pol
        ps, pe = self.pad_start, self.pad_end
        n_sh = jax.lax.axis_size("time")
        fwd = [(i, i + 1) for i in range(n_sh - 1)]
        bwd = [(i + 1, i) for i in range(n_sh - 1)]

        def edges(c):
            # decode only the edge samples; exchange them as f32
            send_bwd, send_fwd = plane_edges_device(c, pe, ps, bits)
            front = jax.lax.ppermute(send_fwd, "time", fwd)
            end = jax.lax.ppermute(send_bwd, "time", bwd)
            return front, end

        fr, er = edges(cr)
        fi, ei = edges(ci)
        norm = {8: 1.0 / 64.0, 4: 1.0 / 4.0, 2: 1.0, 1: 1.0}[bits]
        scale = ((1.0 + 1e-6 * off) * norm).reshape(1)
        shard = jax.lax.axis_index("time")
        fold3 = self._shard_fold3(foldv, shard, T, include_pad=True)
        prof, cnt = dedisperse_fold_split_packed(
            cr.reshape(tq, L), ci.reshape(tq, L),
            fr.reshape(ps, L), fi.reshape(ps, L),
            er.reshape(pe, L), ei.reshape(pe, L),
            csr.reshape(csr.shape[0], csr.shape[1], -1),
            csi.reshape(csi.shape[0], csi.shape[1], -1),
            fold3, scale, bits=bits, stokes=self.detect == "stokes",
            n_phase=self.n_phase, pad_start=ps, n_valid=T)
        return self._profile_epilogue(prof, cnt, c_local, n_pol)

    def _local_step_pallas_split(self, xr, xi, csr, csi, off, foldv):
        """Split-plane fused step: like :meth:`_local_step_pallas_planes`
        but carrying separate (T, C, P) re/im arrays — flat planes stream
        at ~2x the HBM bandwidth of a packed leading-(2, ...) array on
        the tunnel v5e (measured 293 vs 157 GB/s), and the kernels read
        them with no relayout.
        """
        from ..ops.dedisperse_pallas import dedisperse_fold_split
        T, c_local, n_pol = xr.shape
        L = c_local * n_pol
        fr, er = self._halo_edges(xr)
        fi, ei = self._halo_edges(xi)
        scale = (1.0 + 1e-6 * off).reshape(1)
        shard = jax.lax.axis_index("time")
        fold3 = self._shard_fold3(foldv, shard, T, include_pad=True)
        prof, cnt = dedisperse_fold_split(
            xr.reshape(T, L), xi.reshape(T, L),
            fr.reshape(self.pad_start, L), fi.reshape(self.pad_start, L),
            er.reshape(self.pad_end, L), ei.reshape(self.pad_end, L),
            csr.reshape(csr.shape[0], csr.shape[1], -1),
            csi.reshape(csi.shape[0], csi.shape[1], -1),
            fold3, scale, stokes=self.detect == "stokes",
            n_phase=self.n_phase, pad_start=self.pad_start, n_valid=T)
        return self._profile_epilogue(prof, cnt, c_local, n_pol)

    def _sharded_and_chirp(self):
        """(sharded_fn, chirp_args) for the current mode."""
        mesh = self.mesh
        if self.use_pallas:
            sharded = jax.shard_map(
                self._local_step_pallas, mesh=mesh,
                in_specs=(P("time", "chan"), P(None, None, "chan"),
                          P(None, None, "chan"), P()),
                out_specs=(P(None, "chan"), P()),
                check_vma=False)  # pallas out_shapes carry no vma info
            csr, csi = self._chirp_storage_np()
            spec = NamedSharding(mesh, P(None, None, "chan"))
            return sharded, (jax.device_put(csr, spec),
                             jax.device_put(csi, spec))
        sharded = jax.shard_map(
            self._local_step, mesh=mesh,
            in_specs=(P("time", "chan"), P(None, "chan"), P()),
            out_specs=(P(None, "chan"), P()))
        chirp = jax.device_put(
            self._chirp_np, NamedSharding(mesh, P(None, "chan")))
        return sharded, (chirp,)

    def step_fn(self):
        """The jitted sharded step: (xf, offset_mod) -> (profile, counts).

        xf has global shape (time_shards * block_samples, n_chan, n_pol, 2)
        sharded P('time','chan'); output profile (n_phase, n_chan, n_pol)
        sharded P(None,'chan') and counts (n_phase,) replicated.
        ``offset_mod`` is a scalar sample offset (fixed-period mode) or a
        (4,) fold-halves vector from :meth:`FoldModel.foldv`.
        """
        if self._step_cache is not None:
            return self._step_cache
        # the chirp travels as jit *arguments* (a closure constant would
        # be inlined via a host round-trip, which the TPU boundary forbids
        # for complex data)
        sharded, chirp_args = self._sharded_and_chirp()
        jstep = jax.jit(
            lambda xf, fold_in, *c: sharded(
                xf, *c, self._foldv_device(fold_in)))

        def step(xf, offset_mod):
            return jstep(xf, jnp.asarray(offset_mod), *chirp_args)

        self._step_cache = step
        return step

    # -- precision folding with host-computed bins -----------------------
    def _local_step_bins(self, xf, *args):
        """Like the fused step but folding on externally supplied bins.

        ``args`` = chirp arg(s) followed by ``bins_f`` — (T_local,) float32
        phase-bin indices computed on the host at full two-double Phase
        precision (e.g. from a Polyco); int-cast on device.
        """
        chirp_args, bins_f = args[:-1], args[-1]
        T = xf.shape[0]
        if self.use_pallas:
            w4 = self._halo_exchange(xf)
            power = self._dedisperse_detect_pow2(w4, *chirp_args, T)
        else:
            power = self._dedisperse_detect_xla_step(xf, chirp_args[0], T)
        from ..ops import fold_accumulate
        bins = jnp.clip(bins_f.astype(jnp.int32), 0, self.n_phase - 1)
        prof, cnt = fold_accumulate(power, bins, self.n_phase)
        return jax.lax.psum(prof, "time"), jax.lax.psum(cnt, "time")

    def step_bins_fn(self):
        """Jitted step ``(xf, bins_f) -> (profile, counts)`` where
        ``bins_f`` are host-computed phase bins (see :meth:`phase_bins`)."""
        mesh = self.mesh
        _, chirp_args = self._sharded_and_chirp()
        chirp_specs = (P(None, None, "chan"),) * 2 if self.use_pallas \
            else (P(None, "chan"),)
        sharded = jax.shard_map(
            self._local_step_bins, mesh=mesh,
            in_specs=(P("time", "chan"),) + chirp_specs + (P("time"),),
            out_specs=(P(None, "chan"), P()),
            check_vma=False)
        jstep = jax.jit(
            lambda xf, bins_f, *c: sharded(xf, *c, bins_f))

        def step(xf, bins_f):
            return jstep(xf, bins_f, *chirp_args)

        return step

    def phase_bins(self, phase, start_time, offset=0):
        """Host-side phase-bin computation for one global block.

        ``phase``: callable Time -> Phase/Quantity (e.g. PolycoPhase);
        evaluated at the ``global_block`` sample times starting at stream
        ``offset``, binned at full two-double precision, returned as the
        float32 array :meth:`step_bins_fn` expects.
        """
        from ..integration import _phase_to_cycles
        from ..utils import units as u
        rate = self.chan_rate.to_value(u.Hz)
        idx = offset + np.arange(self.global_block)
        t = start_time + u.Quantity(idx / rate, u.s)
        hi, lo = _phase_to_cycles(phase(t))
        frac = (hi - np.floor(hi)) + lo
        frac = frac - np.floor(frac)
        bins = np.minimum((frac * self.n_phase).astype(np.int64),
                          self.n_phase - 1)
        return bins.astype(np.float32)

    def run_fn(self, n_iter, offset0=0, ingest_bits=None, unroll=4):
        """A jitted on-device loop of ``n_iter`` pipeline steps.

        ``unroll`` places that many pipeline steps inside each device
        loop iteration: the device charges a FIXED ~1.15 ms per loop
        step regardless of size (tools/profile_quad.py base fit), so
        unrolling cuts that cost's per-block share — measured +8-30%
        on the fused configs (BASELINE.md round 4).

        Each iteration generates a fresh noise block on device (counter
        PRNG keyed on the iteration), advances the fold offset, and
        accumulates the profiles — one host dispatch measures ``n_iter``
        full dedisperse→detect→fold steps with no host round-trips, which
        is the honest way to time through a remote device tunnel.

        With a ``phase_model`` configured, the host pre-evaluates the
        polyco once per block into an (n_iter, 4) fold-parameter table
        (models/foldmodel.py) that rides into the loop as one array —
        the flagship then folds a *drifting* pulsar with no extra device
        work per sample (reference integration.py:380-395 semantics).

        With ``ingest_bits=8`` (pallas mode only) the loop input is
        *packed offset-binary bytes* resident in HBM — one byte per
        real/imag component, carried in float32 bit patterns — and each
        iteration starts with the on-device decode
        (ops/unpack_device.unpack_8bit_device).  This is the honest
        "from 8-bit baseband" configuration: the decode's HBM cost
        (1-byte read + full-width write per component) is inside the
        timed loop.  Reference analogue: the decode layer under
        ``Base.read`` (base.py:389-438).

        Returns ``run(seed) -> (profile_sum, count_sum)``.
        """
        T = self.global_block
        per_q = float(self._per_q)
        if ingest_bits not in (None, 1, 2, 4, 8):
            raise ValueError("ingest_bits must be None, 1, 2, 4 or 8")
        if ingest_bits and not self.use_pallas:
            raise ValueError("packed ingest requires use_pallas=True")
        if ingest_bits:
            from ..ops.dedisperse_pallas import split_n
            n1, n2 = split_n(self._n_fft)
            nm = (self._n_fft - self.pad_start - self.pad_end) // n2
            per = 32 // ingest_bits
            if nm % per:
                raise ValueError(
                    f"{ingest_bits}-bit ingest needs the window main rows "
                    f"({nm}) divisible by {per}; adjust block_samples")
        if self.fold_model is not None:
            fold_table = jnp.asarray(self.fold_model.table(
                offset0 + np.arange(n_iter) * T, T))
        else:
            fold_table = None
        if self.use_pallas:
            # split-plane loop carry: windows are assembled inside the
            # stage-A kernel from block + halo edges, the per-iteration
            # scale is applied there from SMEM, and re/im travel as two
            # flat arrays (full-bandwidth layout)
            # bind the bit depth into the step (not via self: a later
            # run_fn call must not retroactively change a closure that
            # has not been traced yet)
            local = (functools.partial(self._local_step_pallas_split_packed,
                                       ingest_bits) if ingest_bits
                     else self._local_step_pallas_split)
            sharded = jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P("time", "chan"), P("time", "chan"),
                          P(None, None, "chan"), P(None, None, "chan"),
                          P(), P()),
                out_specs=(P(None, "chan"), P()),
                check_vma=False)
            csr, csi = self._chirp_storage_np()
            spec = NamedSharding(self.mesh, P(None, None, "chan"))
            chirp_args = (jax.device_put(csr, spec),
                          jax.device_put(csi, spec))
            if ingest_bits:
                shape = (T * ingest_bits // 32, self.n_chan, self.n_pol)
            else:
                shape = (T, self.n_chan, self.n_pol)
            split_planes = True
        else:
            sharded, chirp_args = self._sharded_and_chirp()
            shape = (T, self.n_chan, self.n_pol, 2)
            split_planes = False

        # the noise block is generated (and cached) per seed OUTSIDE the
        # measured loop: the iteration scale 1 + 1e-6·off applied inside
        # keeps every pass data-dependent (nothing hoists), while the
        # threefry cost — which is ingest, not pipeline work — stays out
        # of the loop body entirely
        in_sharding = NamedSharding(self.mesh, P("time", "chan"))

        @functools.partial(jax.jit,
                           out_shardings=(in_sharding,) * (2 if split_planes
                                                           else 1))
        def jgen(seed):
            key = jax.random.key(seed.astype(jnp.int32))
            if split_planes and ingest_bits:
                # packed bytes as f32 carriers (uniform random payload)
                return tuple(jax.lax.bitcast_convert_type(
                    jax.random.bits(jax.random.fold_in(key, i), shape,
                                    jnp.uint32), jnp.float32)
                    for i in (0, 1))
            if split_planes:
                return (jax.random.normal(key, shape, jnp.float32),
                        jax.random.normal(jax.random.fold_in(key, 1),
                                          shape, jnp.float32))
            return (jax.random.normal(key, shape, jnp.float32),)

        def run_inner(*args):
            bases, chirp_f = args[:len(jgen_out)], args[len(jgen_out):]

            def body(k, carry):
                off, acc, cnt_acc = carry
                if fold_table is not None:
                    foldv = self._foldv_from_halves(jax.lax.dynamic_slice(
                        fold_table, (k, 0), (1, 4))[0])
                else:
                    foldv = self._fixed_foldv(off)
                if split_planes:
                    prof, cnt = sharded(bases[0], bases[1], *chirp_f,
                                        off, foldv)
                else:
                    xf = bases[0] * (1.0 + 1e-6 * off)
                    prof, cnt = sharded(xf, *chirp_f, foldv)
                off = jnp.mod(off + T, per_q)
                return off, acc + prof, cnt_acc + cnt
            # the fixed-period offset carry starts at offset0 (mod the
            # exact period denominator), so tiled runs fold coherently
            init = (jnp.float32(float(offset0) % per_q),
                    jnp.zeros((self.n_phase, self.n_chan,
                               4 if self.detect == "stokes"
                               else self.n_pol),
                              jnp.float32),
                    jnp.zeros((self.n_phase,), jnp.float32))
            _, acc, cnt_acc = jax.lax.fori_loop(
                0, n_iter, body, init,
                unroll=min(int(unroll), int(n_iter)) or 1)
            return acc, cnt_acc

        jgen_out = (0, 1) if split_planes else (0,)
        jrun = jax.jit(run_inner)
        base_cache = {}

        def run(seed=jnp.float32(0)):
            s = float(seed)
            if s not in base_cache:
                base_cache[s] = jgen(jnp.float32(s))
            return jrun(*base_cache[s], *chirp_args)

        return run

    # -- conveniences ----------------------------------------------------
    @property
    def global_block(self):
        """Samples consumed per step across the whole mesh."""
        return self.block_samples * self.n_time_shards

    def example_inputs(self, seed=0):
        """Small random inputs with the right shapes/shardings."""
        rng = np.random.default_rng(seed)
        T = self.global_block
        xf = rng.standard_normal(
            (T, self.n_chan, self.n_pol, 2)).astype(np.float32)
        xf = jax.device_put(
            xf, NamedSharding(self.mesh, P("time", "chan")))
        return xf, jnp.float32(0)
