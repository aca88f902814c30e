"""Faraday rotation of polarized voltage streams.

Beyond the reference (mhvk/baseband-tasks has no polarization
calibration): magnetized plasma along the line of sight rotates the
polarization position angle by ``psi(nu) = RM * lambda(nu)**2``
(RM in rad/m^2).  Working on raw voltages, the rotation can be applied
— or, with the opposite sign, coherently removed *before* detection —
exactly, per channel:

* linear feeds (labels like X/Y): the 2x2 rotation
  ``[x', y'] = [x cos(psi) - y sin(psi), x sin(psi) + y cos(psi)]``;
* circular feeds (labels like L/R): pure phases
  ``l' = l exp(+i psi)``, ``r' = r exp(-i psi)`` (the same operator in
  the circular basis).

Conventions: psi grows counterclockwise (X toward Y) for positive RM,
so the detected linear-basis Stokes vector ``P = Q + iU`` (with
``Q = XX - YY``, ``U = 2 Re(X Y*)`` from :class:`~.functions.Power`
components) winds as ``P ∝ exp(2i RM lambda**2)`` — the sign
:class:`~.models.RMSynthesis` inverts.  Pass ``reference_frequency`` to
rotate relative to that frequency's position angle instead of the
infinite-frequency (lambda = 0) angle.

Pure per-channel elementwise math: XLA fuses it into neighboring
stages, and ``task_planes`` keeps the compiled planes interchange
(models/compiled.py) copy-free.
"""

from __future__ import annotations

import numpy as np

from .base import TaskBase, getattr_if_none
from .utils import units as u

__all__ = ["FaradayRotate", "DeFaraday", "C_M_PER_S"]

#: speed of light (m/s), for lambda = c / nu
C_M_PER_S = 299_792_458.0

_LINEAR_PAIRS = ({"X", "Y"}, {"H", "V"})
_CIRCULAR_PAIRS = ({"L", "R"},)


def _rm_to_value(rm):
    """rad/m^2 as a plain float from a float or a units.Quantity."""
    if isinstance(rm, u.Quantity):
        return float(rm.to_value(u.rad / u.m ** 2))
    return float(rm)


class FaradayRotate(TaskBase):
    """Rotate the polarization of dual-pol complex voltages by
    ``psi(nu) = rm * (lambda(nu)**2 - lambda_ref**2)``.

    Parameters
    ----------
    ih : stream
        Complex dual-polarization input with per-channel ``frequency``
        labels.
    rm : float or Quantity
        Rotation measure in rad/m^2.  Positive applies the physical
        rotation; negative coherently de-rotates (see :class:`DeFaraday`).
    reference_frequency : Quantity, optional
        Frequency whose position angle is held fixed (default: the
        infinite-frequency angle, lambda_ref = 0).
    basis : {'linear', 'circular'}, optional
        Feed basis; inferred from polarization labels (X/Y, H/V →
        linear; L/R → circular) when not given.
    pol_axis : int, optional
        Polarization axis within the sample shape; inferred from the
        labels when not given.
    """

    def __init__(self, ih, rm, *, reference_frequency=None, basis=None,
                 pol_axis=None, polarization=None):
        if ih.dtype.kind != "c":
            raise ValueError("FaradayRotate requires complex voltages "
                             "(rotate before detection).")
        polarization = getattr_if_none(ih, "polarization", polarization,
                                       required=False)
        # component order along the pol axis: index of the X/H/L-like
        # component, then the Y/V/R-like one.  Without labels the
        # (X, Y) / (L, R) order is assumed.
        order = (0, 1)
        if pol_axis is None or basis is None:
            if polarization is None:
                raise ValueError("need polarization labels (or explicit "
                                 "pol_axis= and basis=)")
            pols = np.broadcast_to(np.asarray(polarization),
                                   ih.sample_shape[len(ih.sample_shape)
                                                   - np.ndim(polarization):])
            found = None
            for axis in range(pols.ndim):
                index = [0] * pols.ndim
                index[axis] = slice(None)
                line = [str(p).upper() for p in pols[tuple(index)]]
                if len(set(line)) == 2:
                    found = (axis + len(ih.sample_shape) - pols.ndim,
                             line)
                    break
            if found is None:
                raise ValueError("could not find a length-2 polarization"
                                 f" axis in labels {polarization}")
            inferred_axis, line = found
            if pol_axis is None:
                pol_axis = inferred_axis
            pair = set(line)
            if basis is None:
                if pair in _LINEAR_PAIRS:
                    basis = "linear"
                elif pair in _CIRCULAR_PAIRS:
                    basis = "circular"
                else:
                    raise ValueError(
                        f"cannot infer feed basis from labels {pair}; "
                        f"pass basis='linear' or 'circular'")
            # honor the label ORDER: streams labeled ['Y','X'] or
            # ['R','L'] must not get the opposite rotation sign
            if line[0] in ("Y", "V", "R"):
                order = (1, 0)
        if basis not in ("linear", "circular"):
            raise ValueError(f"unknown basis {basis!r}")
        pol_axis = int(pol_axis) % len(ih.sample_shape)
        if ih.sample_shape[pol_axis] != 2:
            raise ValueError("polarization axis must have length 2")
        frequency = getattr(ih, "frequency", None)
        if frequency is None:
            raise ValueError("input needs per-channel frequency labels")

        self._rm = _rm_to_value(rm)
        self._basis = basis
        self._pol_axis = pol_axis
        self._order = order
        # psi per sample-shape element, frequency-independent of pol
        freq_hz = np.broadcast_to(
            np.asarray(frequency.to_value(u.Hz), dtype=np.float64),
            ih.sample_shape)
        if not (np.ptp(freq_hz, axis=self._pol_axis) == 0).all():
            raise ValueError("frequency must not vary along the "
                             "polarization axis")
        lam2 = (C_M_PER_S / freq_hz) ** 2
        if reference_frequency is not None:
            lam2 = lam2 - (C_M_PER_S
                           / float(reference_frequency.to_value(u.Hz))
                           ) ** 2
        self._psi = self._rm * np.take(lam2, 0, axis=self._pol_axis)
        self._reference_frequency = reference_frequency
        self._phase_cache = None
        super().__init__(ih, polarization=polarization)

    @property
    def rm(self):
        """Rotation measure (rad/m^2)."""
        return u.Quantity(self._rm, u.rad / u.m ** 2)

    @property
    def basis(self):
        return self._basis

    def _trig(self):
        """Device (cos psi, sin psi), shaped (1,) + sample shape with
        the polarization axis removed (broadcasts against one pol
        component with its leading time axis)."""
        import jax.numpy as jnp
        if self._phase_cache is None:
            c = np.cos(self._psi).astype(np.float32)
            s = np.sin(self._psi).astype(np.float32)
            self._phase_cache = (jnp.asarray(c[np.newaxis]),
                                 jnp.asarray(s[np.newaxis]))
        return self._phase_cache

    def task(self, data):
        import jax.numpy as jnp
        c, s = self._trig()
        axis = self._pol_axis + 1
        ix, iy = self._order
        a = jnp.take(data, ix, axis=axis)     # X / H / L component
        b = jnp.take(data, iy, axis=axis)     # Y / V / R component
        if self._basis == "linear":
            xo, yo = c * a - s * b, s * a + c * b
        else:
            # l' = l e^{+i psi}, r' = r e^{-i psi}
            rot = jnp.asarray(c, data.dtype) + 1j * jnp.asarray(
                s, data.dtype)
            xo, yo = a * rot, b * jnp.conj(rot)
        comps = [None, None]
        comps[ix], comps[iy] = xo, yo
        return jnp.stack(comps, axis=axis)

    def task_planes(self, pair):
        """Planes form: the rotation has real coefficients on each
        plane, so re/im never recombine (models/compiled.py)."""
        import jax.numpy as jnp
        xr, xi = pair
        if xi is None:
            return NotImplemented
        c, s = self._trig()
        axis = self._pol_axis + 1
        ix, iy = self._order

        def split(x):
            return (jnp.take(x, ix, axis=axis),
                    jnp.take(x, iy, axis=axis))

        ar, br = split(xr)
        ai, bi = split(xi)
        if self._basis == "linear":
            xo = (c * ar - s * br, c * ai - s * bi)
            yo = (s * ar + c * br, s * ai + c * bi)
        else:
            # (a_r + i a_i)(c + i s); conj for the R-like component
            xo = (c * ar - s * ai, c * ai + s * ar)
            yo = (c * br + s * bi, c * bi - s * br)
        comps_r = [None, None]
        comps_i = [None, None]
        comps_r[ix], comps_i[ix] = xo
        comps_r[iy], comps_i[iy] = yo
        return (jnp.stack(comps_r, axis=axis),
                jnp.stack(comps_i, axis=axis))


class DeFaraday(FaradayRotate):
    """Coherently remove Faraday rotation of measure ``rm`` (i.e.
    :class:`FaradayRotate` with the opposite sign, reference
    pfb-style naming: Dedisperse is to Disperse as DeFaraday is to
    FaradayRotate)."""

    def __init__(self, ih, rm, **kwargs):
        rm = _rm_to_value(rm)
        super().__init__(ih, -rm, **kwargs)

    @property
    def rm(self):
        """The rotation measure being removed (rad/m^2)."""
        return u.Quantity(-self._rm, u.rad / u.m ** 2)
