"""Field I/O, checkpoint/restart, and the Nek5000 field-file reader.

Rebuild of the reference's restart machinery (core/IO.f90, the
``arnoldi_checkpoint`` KRY/HES files of core/eigensolvers.f90:758-857, and the
``BF_`` 64-bit base-flow outposts) on a simple portable container: one ``.npz``
per field snapshot with metadata (including ``time`` — the reference smuggles
the UPO period in the file time, linear_stab.f90:192-198).

:func:`read_nek_field` parses native Nek5000 ``#std`` binary field files so
reference fixtures (e.g. examples/cylinder/BF_1cyl0.f00001) can be
cross-validated against this framework without Nek installed."""

from .fields import save_field, load_field, FieldFile
from .nek import read_nek_field, NekField
from .checkpoint import ArnoldiCheckpoint

__all__ = [
    "save_field",
    "load_field",
    "FieldFile",
    "read_nek_field",
    "NekField",
    "ArnoldiCheckpoint",
]
