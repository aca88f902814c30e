"""I/O formats: HDF5 stream container; PSRFITS fold-mode files; VDIF
and DADA baseband files."""

from . import dada
from . import hdf5
from . import vdif

__all__ = ["dada", "hdf5", "vdif"]
