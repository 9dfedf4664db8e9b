import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from nekstab_next_tpu.mesh import box_mesh_2d
from nekstab_next_tpu.ops import SEM
from nekstab_next_tpu.stepper import NavierStokes, initial_state

nu = 0.1
mesh = box_mesh_2d(6, 6, order=6, x0=0, x1=2*np.pi, y0=0, y1=2*np.pi,
                   periodic_x=True, periodic_y=True)
sem = SEM(mesh)

def tg(t):
    f = np.exp(-2.0*nu*t)
    u = -np.cos(mesh.x)*np.sin(mesh.y)*f
    v = np.sin(mesh.x)*np.cos(mesh.y)*f
    p = -0.25*(np.cos(2*mesh.x)+np.cos(2*mesh.y))*f*f
    return u, v, p

u0, v0, p0 = tg(0.0)
u = jnp.stack([jnp.asarray(u0), jnp.asarray(v0)], axis=-1)
dt = 0.01
ns = NavierStokes(sem, viscosity=nu, dt=dt)
st = ns.make_state(u, p=sem.p_from_gll(jnp.asarray(p0)) if ns.p_shape != sem.bm.shape else jnp.asarray(p0))
step = jax.jit(ns.step)
for k in range(5):
    st = step(st)
    ue, ve, pe = tg(float(st.time))
    err = float(sem.norm(st.u[..., 0] - jnp.asarray(ue)))
    print(f"step {k+1} t={float(st.time):.3f} |u|={float(sem.norm(st.u[...,0])):.6f} "
          f"|ue|={float(sem.norm(jnp.asarray(ue))):.6f} err={err:.3e} "
          f"div={float(sem.norm(sem.div(st.u[...,0], st.u[...,1]))):.2e} "
          f"|p-pe|={float(sem.norm((sem.p_to_gll(st.p) if st.p.shape != pe.shape else st.p) - jnp.asarray(pe))):.2e}")
