"""Phase-callable providers for folding: polyco- and PINT-backed.

Counterpart of `/root/reference/baseband_tasks/phases/core.py`
(``PintPhase`` core.py:16, ``PolycoPhase`` core.py:86): both expose
``__call__(t) -> Phase`` and ``apparent_spin_freq(t) -> Quantity``.
PINT is an optional dependency (not available in this environment); the
adapter raises a clear ImportError at construction when missing.
"""

from __future__ import annotations

import numpy as np

from ..utils import units as u
from .phase import Phase
from .predictor import Polyco

__all__ = ["PolycoPhase", "PintPhase"]


class PolycoPhase:
    """Phase and apparent spin frequency from a tempo polyco file."""

    def __init__(self, polyco):
        self.polyco = polyco if isinstance(polyco, Polyco) else Polyco(polyco)

    def __call__(self, t):
        return self.polyco(t)

    def apparent_spin_freq(self, t):
        return self.polyco(t, deriv=1)


class PintPhase:
    """Phase via a PINT timing model (.par file).

    Requires the optional ``pint-pulsar`` package (reference core.py:16-83;
    ~10 ns precision).  Arguments mirror the reference: ``par_file``,
    ``observatory``, ``frequency``, plus ``**kwargs`` forwarded to the TOA
    builder (`pint_toas.py`).
    """

    def __init__(self, par_file, observatory, frequency, **kwargs):
        try:
            import pint.models  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "PintPhase requires the 'pint-pulsar' package, which is not "
                "installed; use PolycoPhase with a polyco file instead."
            ) from exc
        from .pint_toas import PintToas
        import pint.models
        self.par_file = par_file
        self.model = pint.models.get_model(par_file)
        self.toa_maker = PintToas(observatory, frequency, **kwargs)

    def __call__(self, t):
        toas = self.toa_maker(t)
        ph = self.model.phase(toas)
        return Phase(np.asarray(ph.int), np.asarray(ph.frac))

    def apparent_spin_freq(self, t):
        toas = self.toa_maker(t)
        f = self.model.d_phase_d_toa(toas)
        return u.Quantity(np.asarray(f.to_value("Hz")), u.Hz)
