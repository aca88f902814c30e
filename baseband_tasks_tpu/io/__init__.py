"""I/O formats: HDF5 stream container; PSRFITS fold-mode files; VDIF,
Mark 5B, DADA and GUPPI raw baseband files."""

from . import dada
from . import guppi
from . import hdf5
from . import mark5b
from . import vdif

__all__ = ["dada", "guppi", "hdf5", "mark5b", "vdif"]
