"""RFI detection and excision via the generalized spectral kurtosis.

Beyond the reference: `mhvk/baseband-tasks` has no RFI module, but any
production reduction of real telescope data needs one between the
filterbank and the detection/folding stages.  The statistic used here is
the generalized spectral-kurtosis (SK) estimator of Nita & Gary (2010,
MNRAS 406, L60): for ``M`` accumulated power samples per channel,

    SK = (M d + 1) / (M - 1) * (M * S2 / S1**2 - 1),

with ``S1 = sum p``, ``S2 = sum p**2`` and ``d`` the gamma shape of a
single power sample (1 for the squared magnitude of complex Gaussian
voltage, 1/2 for squared real Gaussian voltage).  For clean noise
``E[SK] = 1`` with asymptotic ``Var[SK] = 2 (d + 1) / (M d)``;
continuous-wave RFI drives SK below 1 (the power distribution narrows),
impulsive RFI drives it above 1.

Both tasks are time-local reductions over fixed-size blocks — sums and
elementwise math that XLA fuses and that shard trivially over channel
axes; no host synchronization is needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import TaskBase
from .functions import complex_square

__all__ = ["spectral_kurtosis", "SpectralKurtosis",
           "ExciseSpectralKurtosis"]


def _gamma_shape(dtype, d):
    """Per-sample power gamma shape: 1 (complex voltage), 1/2 (real)."""
    if d is not None:
        if d <= 0:
            raise ValueError("gamma shape d must be positive")
        return float(d)
    return 1.0 if np.dtype(dtype).kind == "c" else 0.5


def spectral_kurtosis(power, n, d=1.0, axis=0):
    """Generalized SK estimator over blocks of ``n`` along ``axis``.

    ``power`` must hold non-negative per-sample powers whose length
    along ``axis`` is a multiple of ``n``.  Returns an array with that
    axis reduced by ``n``; clean Gaussian noise gives values near 1.
    """
    if n < 2:
        raise ValueError("need at least 2 samples per SK block")
    power = jnp.asarray(power)
    shape = power.shape
    if shape[axis] % n:
        raise ValueError(f"axis length {shape[axis]} is not a multiple "
                         f"of the block size {n}")
    axis = axis % power.ndim
    blocked = power.reshape(
        shape[:axis] + (shape[axis] // n, n) + shape[axis + 1:])
    s1 = blocked.sum(axis=axis + 1)
    s2 = (blocked * blocked).sum(axis=axis + 1)
    # an all-zero block (padding, dropped frames) has no defined SK;
    # report the clean value so it is not flagged
    v = n * s2 / jnp.where(s1 == 0, 1.0, s1 * s1)
    sk = (n * d + 1.0) / (n - 1.0) * (v - 1.0)
    return jnp.where(s1 == 0, 1.0, sk)


def sk_sigma(n, d=1.0):
    """Asymptotic standard deviation of the SK estimator for clean
    noise: ``sqrt(2 (d + 1) / (n d))`` (delta-method expansion of the
    Nita & Gary estimator; exact to O(1/n))."""
    return float(np.sqrt(2.0 * (d + 1.0) / (n * d)))


class SpectralKurtosis(TaskBase):
    """SK statistic stream: one value per channel per ``n`` samples.

    Takes a *voltage* stream (real or complex; power is formed
    internally) and produces the per-channel spectral kurtosis at
    ``sample_rate / n`` — the diagnostic companion of
    :class:`ExciseSpectralKurtosis`.

    Parameters
    ----------
    ih : stream
        Input voltages, typically channelized.
    n : int
        Power samples accumulated per SK estimate (``M``).
    d : float, optional
        Gamma shape of one power sample.  Default: 1 for complex input,
        1/2 for real input.
    """

    def __init__(self, ih, n, *, d=None, samples_per_frame=None):
        if n < 2:
            raise ValueError("need at least 2 samples per SK block")
        self._n = int(n)
        self._d = _gamma_shape(ih.dtype, d)
        super().__init__(ih, sample_rate=ih.sample_rate / n,
                         samples_per_frame=samples_per_frame,
                         dtype=np.float32)

    @property
    def sigma(self):
        """Clean-noise standard deviation of the output values."""
        return sk_sigma(self._n, self._d)

    def task(self, data):
        power = complex_square(data) if data.dtype.kind == "c" \
            else jnp.asarray(data) ** 2
        return spectral_kurtosis(power, self._n, self._d).astype(
            jnp.float32)


class ExciseSpectralKurtosis(TaskBase):
    """Zero channel-blocks whose spectral kurtosis is non-thermal.

    A same-shape, same-rate transform: the stream is cut into blocks of
    ``n`` samples per channel; any (block, channel) cell whose SK
    deviates from 1 by more than ``threshold`` clean-noise sigmas
    (``sigma = sqrt(2 (d+1) / (n d))``) is replaced by zeros.  Zeroing
    (rather than noise injection) keeps the operation deterministic and
    linear-in-the-data; downstream averages are biased low by the
    flagged fraction, which the SK stream itself measures.

    The false-alarm rate on clean data is the two-sided Gaussian tail,
    ~0.3% at the default ``threshold=3``.

    Parameters
    ----------
    ih : stream
        Input voltages, typically channelized.
    n : int
        Samples per SK decision block (``M``).  Frames are sized to a
        multiple of ``n``; a partial block at the very end of the
        stream is judged with its own (shorter) ``M`` when it has ≥ 2
        samples and passed through unflagged otherwise.
    threshold : float, optional
        Flagging threshold in units of the clean-noise sigma.
    d : float, optional
        Gamma shape of one power sample (see module docstring).
    fill : float, optional
        Value written into flagged cells (default 0).  Use ``np.nan``
        together with a downstream ``Integrate``/``Fold`` built with
        ``masked=True``: flagged cells are then *excluded per cell*
        from the averages instead of biasing them low.  NaN fill is
        meant for detection-stage chains (flag → detect → integrate);
        do not feed NaNs into FFT-based stages (one NaN smears over the
        whole transform).
    """

    def __init__(self, ih, n, *, threshold=3.0, d=None, fill=0.0,
                 samples_per_frame=None):
        if n < 2:
            raise ValueError("need at least 2 samples per SK block")
        self._n = int(n)
        self._fill = complex(fill) if np.dtype(ih.dtype).kind == "c" \
            else float(fill)
        self._threshold = float(threshold)
        self._d = _gamma_shape(ih.dtype, d)
        if samples_per_frame is None:
            spf = getattr(ih, "samples_per_frame", 1)
            samples_per_frame = max(round(spf / n), 1) * n
        elif samples_per_frame % n:
            raise ValueError(f"samples_per_frame {samples_per_frame} "
                             f"must be a multiple of the block size {n}")
        # compiled scans must cut the stream on the decision-block grid
        # so compiled == eager flag-for-flag (models/compiled.py)
        self._task_granularity = self._n
        super().__init__(ih, samples_per_frame=samples_per_frame)

    @property
    def sigma(self):
        """Clean-noise standard deviation of the SK statistic."""
        return sk_sigma(self._n, self._d)

    def _keep_mask(self, power, n):
        sk = spectral_kurtosis(power, n, self._d)
        limit = self._threshold * sk_sigma(n, self._d)
        return jnp.abs(sk - 1.0) <= limit

    def _excise(self, data, n):
        power = complex_square(data) if data.dtype.kind == "c" \
            else jnp.asarray(data) ** 2
        keep = self._keep_mask(power, n)             # (k,) + sample_shape
        keep = jnp.repeat(keep, n, axis=0)           # (k*n,) + sample_shape
        data = jnp.asarray(data)
        if self._fill == 0:
            # multiply instead of select: XLA fuses it into whatever
            # surrounds, and 0 * anything-finite is exact
            return data * keep.astype(power.dtype)
        return jnp.where(keep, data, jnp.asarray(self._fill, data.dtype))

    def task(self, data):
        n = self._n
        whole = (len(data) // n) * n
        if whole == len(data):
            return self._excise(data, n)
        head, tail = data[:whole], data[whole:]
        parts = []
        if whole:
            parts.append(self._excise(head, n))
        # judge the final partial block with its own, shorter M
        parts.append(self._excise(tail, len(tail)) if len(tail) >= 2
                     else jnp.asarray(tail))
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]
