"""Extended-precision pulse phase.

Counterpart of `/root/reference/baseband_tasks/phases/phase.py`: a
:class:`Phase` stores a phase as two float64 parts — an integer cycle count
and a fractional part in [-0.5, 0.5) — giving ~1e-16 cycle precision even
at 1e10 cycles (phase.py:350-352), which is what pulsar folding needs.
:class:`FractionalPhase` is the wrapped fractional part.

Host-only (numpy): phases feed the fold binning at frame granularity; the
device only ever sees the per-sample bin indices derived from them.
"""

from __future__ import annotations

import numpy as np

from ..utils import units as u
from ..utils.time import two_sum

__all__ = ["Phase", "FractionalPhase"]


def _split(value):
    """Split float64 cycles into (integer part, fraction in [-0.5, 0.5))."""
    value = np.asarray(value, dtype=np.float64)
    int_part = np.round(value)
    frac = value - int_part
    return int_part, frac


def _normalize(count, frac):
    """Renormalize so count is integral and frac in [-0.5, 0.5)."""
    extra = np.round(frac)
    count = count + extra
    frac = frac - extra
    return count, frac


def _parse_decimal(string):
    """Parse a decimal-cycle string losslessly into (count, frac)."""
    string = string.strip()
    neg = string.startswith("-")
    body = string.lstrip("+-")
    if "." in body:
        ip, fp = body.split(".")
        count = float(ip or 0)
        frac = float("0." + fp)
    else:
        count, frac = float(body), 0.0
    if neg:
        count, frac = -count, -frac
    return count, frac


_SPLITTER = 134217729.0  # 2**27 + 1, Dekker splitting constant


def _two_prod(a, b):
    """Error-free product: a * b = p + e exactly (Dekker/Veltkamp)."""
    p = a * b
    ac = a * _SPLITTER
    ah = ac - (ac - a)
    al = a - ah
    bc = b * _SPLITTER
    bh = bc - (bc - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


class FractionalPhase(u.Quantity):
    """Fractional phase: cycles wrapped to [-0.5, 0.5)."""

    def __init__(self, value, unit=None):
        if isinstance(value, Phase):
            value = value.frac
        q = u.Quantity(value, unit if unit is not None else u.cycle)
        val = np.asarray(q.to_value(u.cycle), dtype=np.float64)
        val = val - np.round(val)
        super().__init__(val, u.cycle)


class Phase:
    """Two-double extended precision phase (in cycles).

    Construct from one or two values (cycles; Quantity or float); the two
    are summed exactly.  ``Phase(count, frac)`` mirrors the reference's
    ``Phase.from_angles`` usage.
    """

    __slots__ = ("count", "fraction", "imaginary")
    # numpy should defer to us
    __array_priority__ = 20000

    def __init__(self, phase1, phase2=0, imaginary=False):
        def coerce(ph):
            nonlocal imaginary
            if isinstance(ph, u.Quantity):
                ph = ph.to_value(u.cycle)
            if isinstance(ph, str):
                return _parse_decimal(ph)
            if isinstance(ph, (list, tuple)) and ph and \
                    isinstance(ph[0], str):
                pairs = [_parse_decimal(x) for x in ph]
                return (np.array([a for a, b in pairs]),
                        np.array([b for a, b in pairs]))
            ph = np.asarray(ph)
            if ph.dtype.kind == "U":
                pairs = [_parse_decimal(x) for x in ph.ravel()]
                return (np.array([a for a, b in pairs]).reshape(ph.shape),
                        np.array([b for a, b in pairs]).reshape(ph.shape))
            if ph.dtype.kind == "c":
                # purely imaginary values mark an imaginary phase
                # (reference check_imaginary, phase.py:113)
                if np.any(ph.real != 0):
                    raise ValueError("phase must be real or purely "
                                     "imaginary")
                imaginary = True
                ph = ph.imag
            return ph

        def parts(ph):
            if isinstance(ph, Phase):
                nonlocal imaginary
                imaginary = imaginary or ph.imaginary
                return ph.count, ph.fraction
            coerced = coerce(ph)
            if isinstance(coerced, tuple):  # pre-split decimal strings
                return coerced
            return _split(coerced)

        c1, f1 = parts(phase1)
        c2, f2 = parts(phase2)
        count = c1 + c2
        hi, lo = two_sum(f1, f2)
        count, frac = _normalize(count, hi)
        frac = frac + lo
        count, frac = _normalize(count, frac)
        self.count = count
        self.fraction = frac
        self.imaginary = bool(imaginary)

    @classmethod
    def from_angles(cls, count, frac, imaginary=False):
        """Exact construction from separately-supplied parts
        (reference phase.py:208)."""
        return cls(count, frac, imaginary=imaginary)

    # -- numpy ufunc interop --------------------------------------------
    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        if method != "__call__" or kwargs.get("out") is not None:
            return NotImplemented
        name = ufunc.__name__
        if name == "exp":
            # exp of an *imaginary* phase: integer cycles drop exactly, so
            # only the fraction enters (reference phase.py:750-753)
            if not self.imaginary:
                return NotImplemented
            return np.exp(2j * np.pi * np.asarray(self.fraction))
        if name in ("sin", "cos", "tan"):
            if self.imaginary:
                return NotImplemented
            return ufunc(2.0 * np.pi * np.asarray(self.fraction)) \
                if name != "tan" else ufunc(2.0 * np.pi
                                            * np.asarray(self.fraction))
        if name == "add":
            a, b = inputs
            return (a if isinstance(a, Phase) else Phase(a)) + b
        if name == "subtract":
            a, b = inputs
            return (a if isinstance(a, Phase) else Phase(a)) - b
        if name == "negative":
            return -self
        if name == "absolute":
            return abs(self)
        if name == "multiply":
            a, b = inputs
            if isinstance(a, Phase):
                return a * b
            return b * a
        return NotImplemented

    # -- views -----------------------------------------------------------
    @property
    def int(self):
        """Integer cycles as a Quantity."""
        return u.Quantity(self.count, u.cycle)

    @property
    def frac(self):
        """Fractional part as a FractionalPhase."""
        return FractionalPhase(self.fraction)

    @property
    def cycle(self):
        """Lossy single-float total phase as a Quantity."""
        return u.Quantity(self.count + self.fraction, u.cycle)

    @property
    def cycle_pair(self):
        """(hi, lo) float64 pair whose sum is the exact phase in cycles."""
        return self.count, self.fraction

    @property
    def shape(self):
        return np.shape(self.count)

    @property
    def ndim(self):
        return np.ndim(self.count)

    @property
    def size(self):
        return np.size(self.count)

    @property
    def isscalar(self):
        return np.ndim(self.count) == 0

    def __len__(self):
        return len(np.asarray(self.count))

    def __getitem__(self, item):
        return Phase.from_angles(np.asarray(self.count)[item],
                                 np.asarray(self.fraction)[item],
                                 imaginary=self.imaginary)

    def reshape(self, shape):
        return Phase.from_angles(np.reshape(self.count, shape),
                                 np.reshape(self.fraction, shape))

    def ravel(self):
        return Phase.from_angles(np.ravel(self.count),
                                 np.ravel(self.fraction))

    def to(self, unit):
        return self.cycle.to(unit)

    def to_value(self, unit=u.cycle):
        return self.cycle.to_value(unit)

    # -- arithmetic ------------------------------------------------------
    def __add__(self, other):
        if not isinstance(other, Phase):
            other = Phase(other)
        if other.imaginary != self.imaginary:
            raise ValueError("cannot mix real and imaginary phases")
        count = self.count + other.count
        hi, lo = two_sum(self.fraction, other.fraction)
        return Phase.from_angles(count, hi + lo,
                                 imaginary=self.imaginary)

    __radd__ = __add__

    def __sub__(self, other):
        if not isinstance(other, Phase):
            other = Phase(other)
        return self + (-other)

    def __rsub__(self, other):
        return (-self) + other

    def __neg__(self):
        return Phase.from_angles(-self.count, -self.fraction,
                                 imaginary=self.imaginary)

    def __abs__(self):
        neg = (self.count + self.fraction) < 0
        return Phase.from_angles(np.where(neg, -self.count, self.count),
                                 np.where(neg, -self.fraction,
                                          self.fraction),
                                 imaginary=self.imaginary)

    def __mul__(self, k):
        if isinstance(k, u.Quantity):
            k = k.to_value(u.one)
        k = np.asarray(k, dtype=np.float64)
        # error-free products keep the result exact to a double-double ulp
        # (reference preserves precision through dimensionless mul,
        # phase.py:679-694)
        pc, ec = _two_prod(np.asarray(self.count, dtype=np.float64), k)
        pf, ef = _two_prod(np.asarray(self.fraction, dtype=np.float64), k)
        return Phase(pc, pf + (ec + ef), imaginary=self.imaginary)

    __rmul__ = __mul__

    def __truediv__(self, k):
        if isinstance(k, u.Quantity):
            k = k.to_value(u.one)
        k = np.asarray(k, dtype=np.float64)
        return self * (1.0 / k) if np.all(k != 0) else Phase(
            self.count / k, self.fraction / k)

    def __floordiv__(self, other):
        other = other if isinstance(other, Phase) else Phase(other)
        q = np.floor((self.count + self.fraction)
                     / (other.count + other.fraction))
        r = self - other * q
        # one-step correction for boundary rounding
        step = np.where(np.asarray(r._diff(_ZERO)) < 0, -1.0, 0.0)
        o_tot = other.count + other.fraction
        over = np.asarray((r - other)._diff(_ZERO)) >= 0
        step = step + np.where(over, 1.0, 0.0)
        return q + step

    def __mod__(self, other):
        other = other if isinstance(other, Phase) else Phase(other)
        q = self.__floordiv__(other)
        return self - other * q

    def __divmod__(self, other):
        other = other if isinstance(other, Phase) else Phase(other)
        q = self.__floordiv__(other)
        return q, self - other * q

    def _diff(self, other):
        return (self.count - other.count) + (self.fraction - other.fraction)

    # -- comparisons (via exact differenced parts, phase.py:666-677) ----
    def __eq__(self, other):
        try:
            other = other if isinstance(other, Phase) else Phase(other)
        except Exception:
            return NotImplemented
        return self._diff(other) == 0

    def __ne__(self, other):
        eq = self.__eq__(other)
        if eq is NotImplemented:
            return eq
        return ~np.asarray(eq) if np.ndim(eq) else not eq

    def __lt__(self, other):
        other = other if isinstance(other, Phase) else Phase(other)
        return self._diff(other) < 0

    def __le__(self, other):
        other = other if isinstance(other, Phase) else Phase(other)
        return self._diff(other) <= 0

    def __gt__(self, other):
        other = other if isinstance(other, Phase) else Phase(other)
        return self._diff(other) > 0

    def __ge__(self, other):
        other = other if isinstance(other, Phase) else Phase(other)
        return self._diff(other) >= 0

    def __hash__(self):
        if not self.isscalar:
            raise TypeError("unhashable array Phase")
        return hash((float(self.count), float(self.fraction)))

    # -- reductions / sorting (precision-preserving, phase.py:490-559) --
    def min(self, axis=None):
        idx = self.argmin(axis)
        if axis is None:
            return self.ravel()[idx]
        return Phase.from_angles(
            np.take_along_axis(np.asarray(self.count),
                               np.expand_dims(idx, axis), axis).squeeze(axis),
            np.take_along_axis(np.asarray(self.fraction),
                               np.expand_dims(idx, axis), axis).squeeze(axis))

    def max(self, axis=None):
        idx = self.argmax(axis)
        if axis is None:
            return self.ravel()[idx]
        return Phase.from_angles(
            np.take_along_axis(np.asarray(self.count),
                               np.expand_dims(idx, axis), axis).squeeze(axis),
            np.take_along_axis(np.asarray(self.fraction),
                               np.expand_dims(idx, axis), axis).squeeze(axis))

    def argmin(self, axis=None):
        if axis is None:
            flat = self.ravel()
            return int(np.lexsort((np.asarray(flat.fraction),
                                   np.asarray(flat.count)))[0])
        return np.take(self.argsort(axis), 0, axis=axis)

    def argmax(self, axis=None):
        if axis is None:
            flat = self.ravel()
            return int(np.lexsort((np.asarray(flat.fraction),
                                   np.asarray(flat.count)))[-1])
        return np.take(self.argsort(axis), -1, axis=axis)

    def argsort(self, axis=-1):
        # lexsort: count is the primary key, fraction breaks exact ties —
        # never loses precision to a combined float key (phase.py:490-559).
        count = np.asarray(self.count)
        frac = np.broadcast_to(np.asarray(self.fraction), count.shape)
        return np.lexsort((frac, count), axis=axis)

    def sort(self, axis=-1):
        idx = self.argsort(axis)
        return Phase.from_angles(
            np.take_along_axis(np.asarray(self.count), idx, axis),
            np.take_along_axis(np.asarray(self.fraction), idx, axis))

    def __repr__(self):
        return f"Phase({self.count!r}, {self.fraction!r})"

    def to_string(self, precision=16):
        """Full-precision decimal string(s) (reference phase.py:345-429):
        integer cycles and fraction concatenated losslessly."""
        def one(c, f):
            neg = (c + f) < 0
            if neg:
                c, f = -c, -f
            if f < 0:
                c -= 1
                f += 1
            frac = f"{f:.{precision}f}"
            if frac.startswith("1"):  # rounded up to 1.000...
                c += 1
                frac = f"{0.0:.{precision}f}"
            return ("-" if neg else "") + f"{int(c)}" + frac[1:]
        if self.isscalar:
            return one(float(self.count), float(self.fraction))
        flat = [one(float(c), float(f))
                for c, f in zip(np.ravel(self.count),
                                np.ravel(self.fraction))]
        return np.array(flat).reshape(self.shape)

    def __str__(self):
        if self.isscalar:
            return self.to_string()
        return repr(self)


_ZERO = None  # placeholder replaced below (Phase needs to exist first)


def _init_zero():
    global _ZERO
    _ZERO = Phase(0.0)


_init_zero()
