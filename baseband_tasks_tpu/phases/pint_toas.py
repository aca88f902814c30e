"""Time -> PINT TOAs conversion (optional dependency).

Counterpart of `/root/reference/baseband_tasks/phases/pint_toas.py`: builds
``pint.toa.TOAs`` from our Time arrays with ephemeris/BIPM/observatory
settings (pint_toas.py:53-96).  Only importable when pint is installed.
"""

from __future__ import annotations

__all__ = ["PintToas"]


class PintToas:
    """Callable turning Time arrays into PINT TOAs.

    Parameters mirror the reference: observatory code, observing frequency,
    solar-system ephemeris, BIPM clock version, and additional flags merged
    into each TOA.
    """

    def __init__(self, observatory, frequency, *, ephem="de440",
                 include_bipm=True, bipm_version="BIPM2019",
                 include_gps=True, planets=False, **control_params):
        import pint.toa  # noqa: F401  (raises if pint missing)
        self.observatory = observatory
        self.frequency = frequency
        self.control_params = dict(
            ephem=ephem, include_bipm=include_bipm,
            bipm_version=bipm_version, include_gps=include_gps,
            planets=planets, **control_params)

    def __call__(self, t):
        import numpy as np
        import pint.toa as toa
        from ..utils import units as u
        freq_mhz = self.frequency.to_value(u.MHz)
        mjds = np.atleast_1d(np.asarray(t.mjd))
        toas = [toa.TOA(m, obs=self.observatory, freq=freq_mhz)
                for m in mjds]
        return toa.get_TOAs_list(toas, **self.control_params)
