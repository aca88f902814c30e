"""I/O formats: HDF5 stream container; PSRFITS fold-mode files."""

from . import hdf5
from . import vdif

__all__ = ["hdf5", "vdif"]
