from .vector import VectorSpace, Basis
from .arnoldi import arnoldi_step, arnoldi_factorization
from .krylov_schur import eigs, EigenResult
from .gmres import gmres
from .svd import svds

__all__ = [
    "VectorSpace",
    "Basis",
    "arnoldi_step",
    "arnoldi_factorization",
    "eigs",
    "EigenResult",
    "gmres",
    "svds",
]
