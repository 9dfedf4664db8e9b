"""Arnoldi checkpoint/restart.

Rebuild of the reference's ``arnoldi_checkpoint`` / restart path
(core/eigensolvers.f90:240-285, 758-857; core/IO.f90:12-73): every outer
iteration can persist the current Krylov basis and Hessenberg so a crashed or
preempted run resumes where it stopped (``KRY*`` field files + ``HES*`` ascii
in the reference; one ``.npz`` bundle here).  Recovery is checkpoint-restart —
the same model the reference uses on PBS clusters (SURVEY.md section 5)."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


class ArnoldiCheckpoint:
    """Persist/restore (basis columns, H, j) for a running factorization.

    The basis is stored as the stacked leading-axis array(s) of the
    :class:`~nekstab_next_tpu.krylov.vector.Basis` pytree (host copy)."""

    def __init__(self, directory: str, session: str = "run"):
        self.directory = directory
        self.session = session
        os.makedirs(directory, exist_ok=True)

    @property
    def path(self) -> str:
        return os.path.join(self.directory, f"KRY_{self.session}.npz")

    def save(self, basis_stacked, H: np.ndarray, ncols: int, **meta) -> str:
        """``basis_stacked``: array (capacity, ...) or list of pytree leaves."""
        leaves = (
            basis_stacked if isinstance(basis_stacked, (list, tuple))
            else [basis_stacked]
        )
        payload = {f"q{i}": np.asarray(l) for i, l in enumerate(leaves)}
        payload["H"] = np.asarray(H)
        payload["ncols"] = np.asarray(int(ncols))
        for k, v in meta.items():
            payload[f"meta_{k}"] = np.asarray(v)
        tmp = self.path + ".tmp.npz"  # np.savez appends .npz otherwise
        np.savez(tmp, **payload)
        os.replace(tmp, self.path)  # atomic: a crash never corrupts the last good checkpoint
        return self.path

    def load(self) -> Optional[Tuple[list, np.ndarray, int, dict]]:
        if not os.path.exists(self.path):
            return None
        with np.load(self.path) as z:
            nq = sum(1 for k in z.files if k.startswith("q"))
            leaves = [z[f"q{i}"] for i in range(nq)]
            meta = {
                k[5:]: z[k] for k in z.files if k.startswith("meta_")
            }
            return leaves, z["H"], int(z["ncols"]), meta

    def clear(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
