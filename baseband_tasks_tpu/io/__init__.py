"""I/O formats: HDF5 stream container; PSRFITS fold-mode files; VDIF,
DADA and GUPPI raw baseband files."""

from . import dada
from . import guppi
from . import hdf5
from . import vdif

__all__ = ["dada", "guppi", "hdf5", "vdif"]
