"""I/O formats: HDF5 stream container; PSRFITS fold-mode files; VDIF,
Mark 5B, DADA and GUPPI raw baseband files; SIGPROC filterbank
(search-mode) files; multi-file sequences."""

from . import dada
from . import guppi
from . import hdf5
from . import mark5b
from . import sequence
from . import sigproc
from . import vdif

__all__ = ["dada", "guppi", "hdf5", "mark5b", "sequence",
           "sigproc", "vdif"]
