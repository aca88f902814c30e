"""Host-side drifting-phase fold models for the fused pipeline.

The fused dedisperse→detect→fold kernels bin pulse phase with *exact*
integer modular arithmetic: bin = (((i0 + t)·p mod q)·n_phase) // q, with
(i0, p, q) runtime int32 scalars (ops/dedisperse_pallas._k3_fold_body).
That map folds a fixed rational period forever without precision loss —
but a real pulsar's apparent spin frequency drifts (Doppler from the
Earth's motion, spindown), so the reference folds arbitrary polyco/PINT
phases per sample (/root/reference/baseband_tasks/integration.py:380-395).

:class:`FoldModel` closes that gap TPU-natively: per block it linearizes
the phase model at full host precision (two-double Phase arithmetic) and
re-encodes it as a fresh (i0, p, q) triple:

- ``p/q`` is the best rational approximation of the instantaneous
  cycles-per-sample rate with ``p·q < 2^31`` (continued-fraction
  convergent), so all kernel products stay exact in int32.  The
  convergent bound |a - p/q| <= 1/q² keeps the in-window linearization
  error below ~1e-6 cycles for q ~ 1e5-1e6.
- The block's absolute phase A/q (A = round(frac(φ₀)·q), error <= 0.5/q
  cycles) is folded into the *offset* via the modular inverse:
  i0 = A·p⁻¹ mod q, using that p, q are coprime after Fraction reduction.
  The kernel then computes (i0+t)·p ≡ A + t·p (mod q) — no kernel change
  and no recompilation, since (i0, p, q) are runtime scalars.

Within-block curvature (fdot over <~1 s) is below 1e-12 cycles and is
ignored; drift across blocks is captured because every block re-evaluates
the polyco.  Device needs only a (3,) float32 vector per block (the axon
TPU boundary transfers float32 only; all entries stay < 2^24 so the f32
round-trip is exact).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from ..utils import units as u

__all__ = ["FoldModel", "best_rational"]


def best_rational(x, max_pq=(1 << 31) - (1 << 20), max_q=1 << 23):
    """Best rational p/q ≈ x (0 < x) subject to p·q < max_pq, q <= max_q.

    Walks the continued-fraction convergents of ``x`` and returns the
    last one satisfying both bounds; the classic convergent bound gives
    |x - p/q| <= 1/q².  Exact rationals with a small denominator are
    returned exactly.  The defaults keep every product in the fold
    kernel's integer map inside int32 (p·idx < p·q < 2^31) and q exactly
    representable in float32 for the device transfer.
    """
    if not np.isfinite(x) or x <= 0:
        raise ValueError(f"fold rate must be positive and finite, got {x}")
    frac = Fraction(float(x))  # exact binary expansion of the float
    p_prev, q_prev = 0, 1
    p_cur, q_cur = 1, 0
    num, den = frac.numerator, frac.denominator
    while den:
        a = num // den
        num, den = den, num - a * den
        p_next = a * p_cur + p_prev
        q_next = a * q_cur + q_prev
        if (p_next * q_next >= max_pq or q_next > max_q) and q_cur:
            break
        p_prev, q_prev = p_cur, q_cur
        p_cur, q_cur = p_next, q_next
    if q_cur == 0:
        raise ValueError(f"cannot approximate {x} under p*q < {max_pq}")
    return p_cur, q_cur


class FoldModel:
    """Per-block (i0, p, q) fold parameters from a phase callable.

    Parameters
    ----------
    phase : callable
        ``phase(t) -> Phase`` plus ``apparent_spin_freq(t) -> Quantity``
        (e.g. :class:`~baseband_tasks_tpu.phases.PolycoPhase`).
    start_time : Time
        Time of global sample 0 of the (channelized) stream being folded.
    sample_rate : Quantity
        Per-channel complex sample rate.
    n_phase : int
        Phase bins the kernel will use; bounds q so that q·n_phase stays
        inside int32.
    """

    def __init__(self, phase, start_time, sample_rate, n_phase=64):
        self.phase = phase
        self.start_time = start_time
        self.sample_rate = sample_rate
        self._rate = float(sample_rate.to_value(u.Hz))
        self._max_q = min(1 << 23, ((1 << 31) - 1) // max(int(n_phase), 1))

    def _time_at(self, offset):
        # two-double time arithmetic: offset/rate split into hi+lo
        from ..utils.time import TimeDelta
        hi = offset / self._rate
        lo = (offset - hi * self._rate) / self._rate
        return self.start_time + TimeDelta.from_sec(hi, lo)

    def foldv(self, offset, n_window):
        """(3,) float32 ``[i0, p, q]`` for a block of ``n_window`` valid
        samples starting at global sample ``offset``.

        ``i0`` encodes the absolute phase at sample ``offset``; the device
        step adds per-shard and pad offsets (mod q) before the kernel.
        """
        from ..integration import _phase_to_cycles
        t_mid = self._time_at(offset + n_window / 2)
        f_app = float(np.atleast_1d(
            self.phase.apparent_spin_freq(t_mid).to_value(u.Hz))[0])
        a1 = f_app / self._rate                    # cycles per sample
        p, q = best_rational(a1, max_q=self._max_q)
        hi, lo = _phase_to_cycles(self.phase(self._time_at(offset)))
        hi = float(np.atleast_1d(hi)[0])
        lo = float(np.atleast_1d(lo)[0])
        frac0 = (hi - np.floor(hi)) + lo
        frac0 -= np.floor(frac0)
        A = int(np.round(frac0 * q)) % q
        i0 = (A * pow(p, -1, q)) % q
        if max(i0, p, q) >= 1 << 24:
            raise ValueError(
                f"fold parameters ({i0}, {p}, {q}) exceed exact float32 "
                f"range; lower best_rational's max_pq")
        return np.array([i0, p, q], dtype=np.float32)

    def table(self, offsets, n_window):
        """(len(offsets), 3) float32 fold-parameter table for a device
        loop (one row per block; rows are selected inside the jitted loop
        so the host never re-enters between iterations)."""
        return np.stack([self.foldv(off, n_window) for off in offsets])
