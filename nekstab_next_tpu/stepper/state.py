"""Flow state pytree.

The TPU-native replacement for Nek5000's velocity/pressure commons plus lag
arrays (``vx/vy/pr``, ``vxlag``, ``abx1/abx2`` ...), which the reference
manipulates through its ``krylov_vector`` type (core/krylov_subspace.f90:12-17).
All arrays carry the element axis first — the sharded axis under SPMD.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class FlowState:
    """One time level of the flow plus BDF3/EXT3 history.

    u     : (nelem, n, n, 2)      velocity
    p     : (nelem, n, n)         pressure
    ulag  : (2, nelem, n, n, 2)   u at steps n-1, n-2 (BDF history)
    nlag  : (2, nelem, n, n, 2)   weak explicit terms at steps n-1, n-2 (EXT)
    time  : ()                    physical time
    step  : ()  int               step counter (drives the BDF startup ramp)
    """

    def __init__(self, u, p, ulag, nlag, time, step):
        self.u = u
        self.p = p
        self.ulag = ulag
        self.nlag = nlag
        self.time = time
        self.step = step

    def tree_flatten(self):
        return (self.u, self.p, self.ulag, self.nlag, self.time, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def replace(self, **kw) -> "FlowState":
        d = dict(
            u=self.u, p=self.p, ulag=self.ulag, nlag=self.nlag,
            time=self.time, step=self.step,
        )
        d.update(kw)
        return FlowState(**d)


def initial_state(
    u: jnp.ndarray,
    p: Optional[jnp.ndarray] = None,
    time: float = 0.0,
    dtype=None,
) -> FlowState:
    """Fresh state from a velocity field; lag arrays zeroed, step=0 so the
    BDF1/2/3 startup ramp applies (mirrors Nek's restart behaviour that the
    reference relies on when it reseeds each matvec, core/matvec.f90:150-242).
    """
    if dtype is not None:
        u = u.astype(dtype)
    if p is None:
        p = jnp.zeros(u.shape[:-1], dtype=u.dtype)
    ulag = jnp.zeros((2,) + u.shape, dtype=u.dtype)
    nlag = jnp.zeros((2,) + u.shape, dtype=u.dtype)
    return FlowState(
        u=u,
        p=p.astype(u.dtype),
        ulag=ulag,
        nlag=nlag,
        time=jnp.asarray(time, dtype=u.dtype),
        step=jnp.asarray(0, dtype=jnp.int32),
    )
